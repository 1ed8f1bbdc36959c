"""Minimal baseline JPEG encoder — test-side inverse of
decode_jpeg_pixels, built only from the spec (ITU T.81): FDCT,
all-ones quant tables, uniform 8-bit canonical huffman tables (12 DC
categories / every AC run-size symbol at code length 8 — canonically
valid since 174/256 <= 1), byte stuffing, optional 4:2:0 subsampling
and restart intervals."""
import struct
import numpy as np

ZIGZAG = [0,1,8,16,9,2,3,10,17,24,32,25,18,11,4,5,12,19,26,33,40,48,41,34,
          27,20,13,6,7,14,21,28,35,42,49,56,57,50,43,36,29,22,15,23,30,37,
          44,51,58,59,52,45,38,31,39,46,53,60,61,54,47,55,62,63]

def dct_matrix():
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c * 0.5

DC_SYMS = list(range(12))
# 0x00 (EOB/EOB0), ZRL, EOBn run-length symbols (progressive), run/size
AC_SYMS = ([0x00, 0xF0] + [r << 4 for r in range(1, 15)]
           + [(r << 4) | s for r in range(16) for s in range(1, 11)])

def huff_spec(symbols):
    bits = [0] * 16
    bits[7] = len(symbols)  # all codes length 8
    return bits, bytes(symbols)

def huff_codes(symbols):
    # canonical: length-8 codes assigned in symbol order starting at 0
    return {sym: (8, i) for i, sym in enumerate(symbols)}

DC_CODES, AC_CODES = huff_codes(DC_SYMS), huff_codes(AC_SYMS)

class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0
    def write(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0
    def pad(self):
        while self.n:
            self.write(1, 1)

def category(v):
    return 0 if v == 0 else int(abs(v)).bit_length()

def encode_block(w, coef, pred):
    diff = int(coef[0]) - pred
    t = category(diff)
    l8, code = DC_CODES[t][0], DC_CODES[t][1]
    w.write(code, 8)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    zz = [int(coef[ZIGZAG[k]]) for k in range(64)]
    k, run = 1, 0
    while k < 64:
        v = zz[k]
        if v == 0:
            run += 1
        else:
            while run > 15:
                w.write(AC_CODES[0xF0][1], 8)
                run -= 16
            s = category(v)
            w.write(AC_CODES[(run << 4) | s][1], 8)
            w.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        k += 1
    if run:
        w.write(AC_CODES[0x00][1], 8)
    return int(coef[0])

def _prep(img, subsample):
    """Shared plane prep: colorspace, optional 4:2:0, MCU-grid padding."""
    img = np.asarray(img, np.float64)
    h, wdt = img.shape[:2]
    gray = img.ndim == 2 or img.shape[2] == 1
    if gray:
        planes = [img.reshape(h, wdt)]
        sampling = [(1, 1)]
    else:
        r, g, bch = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bch
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bch + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bch + 128
        if subsample:
            def ds(p):
                H, W = p.shape
                H2, W2 = (H + 1) // 2 * 2, (W + 1) // 2 * 2
                pp = np.pad(p, ((0, H2 - H), (0, W2 - W)), mode="edge")
                return (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4
            planes = [y, ds(cb), ds(cr)]
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            sampling = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux, mcuy = -(-wdt // (8 * hmax)), -(-h // (8 * vmax))
    padded = []
    for p, (hs, vs) in zip(planes, sampling):
        H, W = mcuy * vs * 8, mcux * hs * 8
        pp = np.pad(p, ((0, H - p.shape[0]), (0, W - p.shape[1])), mode="edge")
        padded.append(pp)
    return h, wdt, padded, sampling, hmax, vmax, mcux, mcuy


def _headers(h, wdt, sampling, sof_marker):
    """SOI + DQT(all-ones) + DHT(DC0/AC0) + SOFn."""
    out = bytearray(b"\xFF\xD8")
    q = bytes([0]) + bytes([1] * 64)
    out += b"\xFF\xDB" + struct.pack(">H", 2 + len(q)) + q
    for tc, syms in ((0, DC_SYMS), (1, AC_SYMS)):
        bits, vals = huff_spec(syms)
        seg = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(seg)) + seg
    ncomp = len(sampling)
    sof = struct.pack(">BHHB", 8, h, wdt, ncomp)
    for c, (hs, vs) in enumerate(sampling):
        sof += bytes([c + 1, (hs << 4) | vs, 0])
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    return out


def encode(img, subsample=False, restart=0):
    h, wdt, padded, sampling, hmax, vmax, mcux, mcuy = _prep(img, subsample)
    C = dct_matrix()
    ncomp = len(padded)
    out = _headers(h, wdt, sampling, b"\xFF\xC0")
    if restart:
        out += b"\xFF\xDD" + struct.pack(">H", 4) + struct.pack(">H", restart)
    sos = bytes([ncomp]) + b"".join(bytes([c + 1, 0x00]) for c in range(ncomp)) + b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos
    w = BitWriter()
    pred = [0] * ncomp
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu and mcu % restart == 0:
                w.pad()
                out += bytes(w.out) + bytes([0xFF, 0xD0 + rst % 8])
                w = BitWriter()
                rst += 1
                pred = [0] * ncomp
            for ci, (p, (hs, vs)) in enumerate(zip(padded, sampling)):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = p[y0:y0+8, x0:x0+8] - 128.0
                        coef = np.round(C @ blk @ C.T)  # quant = 1
                        pred[ci] = encode_block(w, coef.reshape(64), pred[ci])
            mcu += 1
    w.pad()
    out += bytes(w.out) + b"\xFF\xD9"
    return bytes(out)


# ---------------------------------------------------------------- progressive

def _coef_planes(padded, sampling, h, wdt, hmax, vmax):
    """FDCT every block once; store zigzag-order int coefficients plus
    each component's effective (non-interleaved) block dims."""
    C = dct_matrix()
    planes = []
    for p, (hs, vs) in zip(padded, sampling):
        BH, BW = p.shape[0] // 8, p.shape[1] // 8
        arr = np.zeros((BH, BW, 64), np.int64)
        for by in range(BH):
            for bx in range(BW):
                blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                arr[by, bx] = np.round(C @ blk @ C.T).reshape(64)[ZIGZAG]
        cw = -(-(wdt * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        ew, eh = -(-cw // 8), -(-ch // 8)
        planes.append((arr, ew, eh))
    return planes


def _sos_header(comp_tables, ss, se, ah, al):
    seg = bytes([len(comp_tables)])
    for cid, td, ta in comp_tables:
        seg += bytes([cid, (td << 4) | ta])
    seg += bytes([ss, se, (ah << 4) | al])
    return b"\xFF\xDA" + struct.pack(">H", 2 + len(seg)) + seg


class _ScanState:
    """EOB-run bookkeeping shared by AC first/refine scans: the pending
    run plus the correction bits owned by it (emitted right after the
    EOBn symbol, T.81 §G.1.2.3)."""

    def __init__(self):
        self.eobrun = 0
        self.be = []  # correction bits owned by the pending EOB run

    def emit_eobrun(self, w):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            w.write(AC_CODES[nbits << 4][1], 8)
            if nbits:
                w.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
            for bit in self.be:
                w.write(bit, 1)
            self.be = []


def _enc_ac_first(w, zz, ss, se, al, st):
    k, run = ss, 0
    while k <= se:
        t = int(zz[k])
        t2 = (t >> al) if t >= 0 else -((-t) >> al)
        if t2 == 0:
            run += 1
            k += 1
            continue
        st.emit_eobrun(w)
        while run > 15:
            w.write(AC_CODES[0xF0][1], 8)
            run -= 16
        s = abs(t2).bit_length()
        w.write(AC_CODES[(run << 4) | s][1], 8)
        w.write(t2 if t2 >= 0 else t2 + (1 << s) - 1, s)
        run = 0
        k += 1
    if run:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.emit_eobrun(w)


def _enc_ac_refine(w, zz, ss, se, al, st):
    absv = {}
    eob = ss - 1  # index of last newly-nonzero coefficient
    for k in range(ss, se + 1):
        a = abs(int(zz[k])) >> al
        absv[k] = a
        if a == 1:
            eob = k
    run, br = 0, []
    for k in range(ss, se + 1):
        a = absv[k]
        if a == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            st.emit_eobrun(w)
            w.write(AC_CODES[0xF0][1], 8)
            run -= 16
            for bit in br:
                w.write(bit, 1)
            br = []
        if a > 1:  # already nonzero: buffer its correction bit
            br.append(a & 1)
            continue
        st.emit_eobrun(w)  # newly nonzero (run, size=1) + sign bit
        w.write(AC_CODES[(run << 4) | 1][1], 8)
        w.write(1 if int(zz[k]) >= 0 else 0, 1)
        for bit in br:
            w.write(bit, 1)
        br = []
        run = 0
    if run > 0 or br:
        st.eobrun += 1
        st.be += br
        if st.eobrun == 0x7FFF or len(st.be) > 900:
            st.emit_eobrun(w)


def encode_progressive(img, subsample=False, restart=0, al_dc=1, al_ac=1,
                       bands=((1, 5), (6, 63))):
    """Progressive (SOF2) encoder — spectral selection + successive
    approximation, the test-side inverse of the decoder's §G.2 paths:
    DC first/refine, AC first with EOB runs, AC refine with buffered
    correction bits, optional restart intervals in every scan."""
    h, wdt, padded, sampling, hmax, vmax, mcux, mcuy = _prep(img, subsample)
    ncomp = len(padded)
    planes = _coef_planes(padded, sampling, h, wdt, hmax, vmax)
    out = _headers(h, wdt, sampling, b"\xFF\xC2")
    if restart:
        out += b"\xFF\xDD" + struct.pack(">H", 4) + struct.pack(">H", restart)

    def dc_units():
        if ncomp > 1:  # interleaved MCU order
            for my in range(mcuy):
                for mx in range(mcux):
                    blocks = []
                    for ci, (hs, vs) in enumerate(sampling):
                        for by in range(vs):
                            for bx in range(hs):
                                blocks.append((ci, my * vs + by, mx * hs + bx))
                    yield blocks
        else:
            _arr, ew, eh = planes[0]
            for by in range(eh):
                for bx in range(ew):
                    yield [(0, by, bx)]

    def run_scan(header, per_unit, unit_iter, reset):
        nonlocal out
        out += header
        w = BitWriter()
        done, rst = 0, 0
        for unit in unit_iter():
            if restart and done and done % restart == 0:
                reset.get("flush", lambda w_: None)(w)
                w.pad()
                out += bytes(w.out) + bytes([0xFF, 0xD0 + rst % 8])
                w = BitWriter()
                rst += 1
                reset["reset"]()
            per_unit(w, unit)
            done += 1
        reset.get("flush", lambda w_: None)(w)
        w.pad()
        out += bytes(w.out)

    # 1. DC first scan (all components, Al=al_dc)
    pred = [0] * ncomp

    def dc_first(w, blocks):
        for ci, by, bx in blocks:
            v = int(planes[ci][0][by, bx, 0]) >> al_dc
            diff = v - pred[ci]
            pred[ci] = v
            t = category(diff)
            w.write(DC_CODES[t][1], 8)
            if t:
                w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)

    def dc_reset():
        for ci in range(ncomp):
            pred[ci] = 0

    hdr = _sos_header([(c + 1, 0, 0) for c in range(ncomp)], 0, 0, 0, al_dc)
    run_scan(hdr, dc_first, dc_units, {"reset": dc_reset})

    # 2. AC first scans (per component, per band, Al=al_ac)
    for ci in range(ncomp):
        arr, ew, eh = planes[ci]
        for bs, be_ in bands:
            st = _ScanState()

            def ac_first(w, unit, arr=arr, bs=bs, be_=be_, st=st):
                by, bx = unit
                _enc_ac_first(w, arr[by, bx], bs, be_, al_ac, st)

            def blk_iter(ew=ew, eh=eh):
                for by in range(eh):
                    for bx in range(ew):
                        yield (by, bx)

            hdr = _sos_header([(ci + 1, 0, 0)], bs, be_, 0, al_ac)
            run_scan(hdr, ac_first, blk_iter,
                     {"reset": lambda st=st: st.__init__(),
                      "flush": lambda w, st=st: st.emit_eobrun(w)})

    # 3. DC refine scans (Ah=a, Al=a-1 down to 0)
    for a in range(al_dc, 0, -1):
        def dc_refine(w, blocks, a=a):
            for ci, by, bx in blocks:
                w.write((int(planes[ci][0][by, bx, 0]) >> (a - 1)) & 1, 1)

        hdr = _sos_header([(c + 1, 0, 0) for c in range(ncomp)], 0, 0, a, a - 1)
        run_scan(hdr, dc_refine, dc_units, {"reset": lambda: None})

    # 4. AC refine scans (per component, per band, Ah=a, Al=a-1)
    for a in range(al_ac, 0, -1):
        for ci in range(ncomp):
            arr, ew, eh = planes[ci]
            for bs, be_ in bands:
                st = _ScanState()

                def ac_refine(w, unit, arr=arr, bs=bs, be_=be_, a=a, st=st):
                    by, bx = unit
                    _enc_ac_refine(w, arr[by, bx], bs, be_, a - 1, st)

                def blk_iter(ew=ew, eh=eh):
                    for by in range(eh):
                        for bx in range(ew):
                            yield (by, bx)

                hdr = _sos_header([(ci + 1, 0, 0)], bs, be_, a, a - 1)
                run_scan(hdr, ac_refine, blk_iter,
                         {"reset": lambda st=st: st.__init__(),
                          "flush": lambda w, st=st: st.emit_eobrun(w)})

    return bytes(out) + b"\xFF\xD9"
