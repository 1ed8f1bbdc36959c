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
AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]

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

def encode(img, subsample=False, restart=0):
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
    C = dct_matrix()
    padded = []
    for p, (hs, vs) in zip(planes, sampling):
        H, W = mcuy * vs * 8, mcux * hs * 8
        pp = np.pad(p, ((0, H - p.shape[0]), (0, W - p.shape[1])), mode="edge")
        padded.append(pp)
    out = bytearray(b"\xFF\xD8")
    # DQT all-ones (table 0)
    q = bytes([0]) + bytes([1] * 64)
    out += b"\xFF\xDB" + struct.pack(">H", 2 + len(q)) + q
    # DHT: DC table 0, AC table 0
    for tc, syms in ((0, DC_SYMS), (1, AC_SYMS)):
        bits, vals = huff_spec(syms)
        seg = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(seg)) + seg
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, wdt, ncomp)
    for c, (hs, vs) in enumerate(sampling):
        sof += bytes([c + 1, (hs << 4) | vs, 0])
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
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
