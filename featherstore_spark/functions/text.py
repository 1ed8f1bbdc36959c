"""Text-analysis functions for training-data pipelines: token counting,
quality scoring, language ID, fingerprinting.

No reference counterpart (featherstore stores opaque feature values); these
are the operations a 100 TB text-corpus pipeline needs on top of the
feature engine.  Everything here is built-in column functions — JVM-side,
whole-stage-codegen, no Python — and each has an exact ANSI-SQL oracle
(__spark_entry__.oracle_sql) so the driver can verify values, not just
shapes.

Determinism notes: token rules are ASCII-explicit (no locale-dependent
classes) so Spark (Java regex) and DuckDB (RE2) agree byte-for-byte.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whole-token split: runs of whitespace.
_WS = r"\s+"
# BPE-ish lexer: word pieces or single non-space punctuation.
BPE_TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"
# Explicit ASCII punctuation class (identical semantics in Java + RE2).
PUNCT_RE = r"[!-/:-@\[-`{-~]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "en", "por"],
}
ALL_STOPWORDS = sorted({w for ws in STOPWORDS.values() for w in ws})


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text; empty text → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(F.coalesce(c, F.lit("")))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, _WS)
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(col)).cast("long")


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish lexical token count (word pieces + punctuation singles)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.coalesce(c, F.lit("")), F.lit(BPE_TOKEN_RE)).cast("long")


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.coalesce(c, F.lit("")), F.lit(PUNCT_RE)).cast("long")


def stopword_count(col: Column | str, words: list[str] | None = None) -> Column:
    """Count of whitespace tokens (lowercased) that are stopwords."""
    words = words if words is not None else ALL_STOPWORDS
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(
        F.filter(ws_tokens(col), lambda t: F.array_contains(wordset, F.lower(t)))
    ).cast("long")


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row text statistics + a composite quality score in [0, 1].

    quality = 0.3*len_ok + 0.3*(1 - punct_ratio) + 0.2*stopword_presence
            + 0.2*avg_token_len_ok — a deterministic heuristic in the
    spirit of C4/Gopher quality filters (length, symbol ratio, stopwords).
    """
    c = F.col(text_col)
    n_chars = F.length(F.coalesce(c, F.lit(""))).cast("long")
    n_tok = token_count(c)
    n_punct = punct_count(c)
    n_stop = stopword_count(c)
    avg_tok_len = F.when(n_tok > 0, n_chars.cast("double") / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(0.0))
    len_ok = F.when((n_chars >= 50) & (n_chars <= 10000), 1.0).otherwise(0.0)
    tok_ok = F.when((avg_tok_len >= 3.0) & (avg_tok_len <= 12.0), 1.0).otherwise(0.0)
    quality = F.round(
        0.3 * len_ok + 0.3 * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0)))
        + 0.2 * F.least(stop_ratio * 10.0, F.lit(1.0)) + 0.2 * tok_ok,
        6,
    )
    # per-row regex/tokenize work runs in the scan stage; rebalance small
    # single-split inputs so it parallelizes (estimate-gated no-op at scale)
    df = balance_small_input(df)
    return (
        df.withColumn("n_chars_computed", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn("n_bpe_tokens", bpe_token_count(c))
        .withColumn("n_punct", n_punct)
        .withColumn("n_stopwords", n_stop)
        .withColumn("avg_token_len", F.round(avg_tok_len, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality_score", quality)
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 3,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1): the
    quality dimension :func:`text_stats` does not cover — machine-generated
    and boilerplate text is repetitive long before its length/punctuation
    profile looks wrong.  Per input row:

    - ``n_lines``          non-blank line occurrences (split on ``\\n``)
    - ``dup_line_frac``    occurrences of duplicated lines / all lines
    - ``dup_line_char_frac``  chars in duplicated-line occurrences / chars
      in all line occurrences
    - ``top_ngram_char_frac`` chars covered by the single most frequent
      REPEATED word ``top_n``-gram / chars in all ``top_n``-gram
      occurrences (0.0 when no gram repeats — a gram occurring once is
      not repetition; ties: highest count, then longest gram)
    - ``dup_ngram_char_frac`` chars in word ``dup_n``-grams occurring >1
      time / chars in all ``dup_n``-gram occurrences
    - ``repetition_ok``    all four fractions under the (Gopher-inspired)
      thresholds 0.30 / 0.20 / 0.20 / 0.30 — computed on the ROUNDED
      6-dp values the operator emits, so SQL twins never race rounding

    Deviation from the paper: "chars covered by duplicated n-grams" counts
    every overlapping occurrence (``count × gram_len``) instead of
    deduplicating overlaps — monotone in the same signal, exactly
    SQL-expressible, and clipped only by the denominator's same counting.

    Plan shape at 100 TB: tokens/lines leave the doc row through ONE
    generator each (posexplode/explode — children evaluate once per row,
    the stored-attribute barrier of SNIPPETS' HOF re-eval trap), n-grams
    form via ``lead`` over doc-local windows (partition = one doc, never
    a global sort), and every aggregate is a map-side-combinable
    count/sum keyed on (doc, gram) — linear, no join wider than the
    corpus token stream.  The gram-keyed shuffle carries the gram STRING
    (≈``top_n``+``dup_n`` ≈ 5× text bytes); at extreme scale narrow it to
    ``md5_long60(gram)`` + ``length(gram)`` on BOTH engine and oracle —
    the fractions only read counts and lengths."""
    from pyspark.sql import Window

    nid = "__rid"
    base = df.select(F.col(id_col).alias(nid), F.col(text_col).alias("__txt"))

    lines = base.select(
        nid,
        F.explode(
            F.filter(
                F.split(F.coalesce(F.col("__txt"), F.lit("")), "\n"),
                lambda ln: F.trim(ln) != "",
            )
        ).alias("line"),
    )
    lc = lines.groupBy(nid, "line").agg(F.count(F.lit(1)).alias("c"))
    cl = F.col("c") * F.length("line")
    la = lc.groupBy(nid).agg(
        F.sum("c").alias("n_lines"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_lines"),
        F.sum(cl).alias("line_chars"),
        F.sum(F.when(F.col("c") > 1, cl).otherwise(0)).alias("dup_line_chars"),
    )

    toks = base.select(
        nid, F.posexplode(F.transform(ws_tokens("__txt"), F.lower)).alias("pos", "tok")
    )
    w = Window.partitionBy(nid).orderBy("pos")
    # windows must be projected BEFORE the explode (generators reject
    # window expressions); doc-local partitions, no global sort
    led = toks.select(
        nid,
        F.col("tok").alias("__l0"),
        *[F.lead("tok", i).over(w).alias(f"__l{i}") for i in range(1, max(top_n, dup_n))],
    )
    leads = [F.col(f"__l{i}") for i in range(max(top_n, dup_n))]

    def _gram(n: int) -> Column:
        # NULL (→ dropped) until the doc has a full n-gram at this pos
        return F.when(leads[n - 1].isNotNull(), F.concat_ws(" ", *leads[:n]))

    grams = led.select(
        nid,
        F.explode(
            F.array(
                F.struct(F.lit("top").alias("which"), _gram(top_n).alias("g")),
                F.struct(F.lit("dup").alias("which"), _gram(dup_n).alias("g")),
            )
        ).alias("__e"),
    ).select(nid, "__e.which", "__e.g").where(F.col("g").isNotNull())
    gc = grams.groupBy(nid, "which", "g").agg(F.count(F.lit(1)).alias("c"))
    gcl = F.col("c") * F.length("g")
    is_top, is_dup = F.col("which") == "top", F.col("which") == "dup"
    ga = gc.groupBy(nid).agg(
        # lexicographic struct-max = (max count, then max count×len):
        # within the max count, count×len orders exactly by gram length.
        # c > 1: a gram occurring ONCE is not repetition — without this a
        # two-token doc scores top_ngram_char_frac 1.0 and short clean
        # docs all fail the flag (Gopher sidesteps this via min-length
        # prefilters; the c>1 guard makes the metric total instead)
        F.max(
            F.when(is_top & (F.col("c") > 1), F.struct(F.col("c").alias("c"), gcl.alias("cl")))
        ).alias("__top"),
        F.sum(F.when(is_top, gcl).otherwise(0)).alias("top_chars"),
        F.sum(F.when(is_dup & (F.col("c") > 1), gcl).otherwise(0)).alias("dup_gram_chars"),
        F.sum(F.when(is_dup, gcl).otherwise(0)).alias("gram_chars"),
    )

    def _frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0)), 6
        )

    out = (
        base.join(la, nid, "left")
        .join(ga, nid, "left")
        .select(
            F.col(nid).alias(id_col),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            _frac(F.coalesce("dup_lines", F.lit(0)), F.coalesce("n_lines", F.lit(0))).alias(
                "dup_line_frac"
            ),
            _frac(
                F.coalesce("dup_line_chars", F.lit(0)), F.coalesce("line_chars", F.lit(0))
            ).alias("dup_line_char_frac"),
            _frac(
                F.coalesce(F.col("__top.cl"), F.lit(0)), F.coalesce("top_chars", F.lit(0))
            ).alias("top_ngram_char_frac"),
            _frac(
                F.coalesce("dup_gram_chars", F.lit(0)), F.coalesce("gram_chars", F.lit(0))
            ).alias("dup_ngram_char_frac"),
        )
    )
    return out.withColumn(
        "repetition_ok",
        (F.col("dup_line_frac") <= 0.30)
        & (F.col("dup_line_char_frac") <= 0.20)
        & (F.col("top_ngram_char_frac") <= 0.20)
        & (F.col("dup_ngram_char_frac") <= 0.30),
    )


#: C4 document-level blocklist: any hit drops the whole document
#: (Raffel et al. 2020 §2.2 uses "lorem ipsum" and the curly brace as
#: boilerplate/code markers; matched on lowercased text).
C4_DOC_BLOCKLIST = ("lorem ipsum", "{")
#: C4 line-level blocklist (the paper drops any line with "javascript").
C4_LINE_BLOCKLIST = ("javascript",)
#: A kept line must end in terminal punctuation (C4's sentence
#: heuristic).  Checked via substring, NOT a ``$``-anchored regex: Java's
#: ``$`` matches before a final ``\r`` line terminator while RE2's does
#: not, so the regex form would silently diverge from the DuckDB twin on
#: CRLF text.
C4_TERMINAL_CHARS = (".", "!", "?", '"')


def c4_line_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line-level corpus cleaning (Raffel et al. 2020, §2.2),
    adapted: per document, KEEP only lines that (a) have ≥ ``min_words``
    whitespace words, (b) end in terminal punctuation (``.!?"`` after
    right-trim), and (c) contain no line-blocklist term; then flag the
    whole document ``c4_keep = false`` when its lowercased text hits the
    document blocklist or fewer than ``min_kept_lines`` lines survive.

    Returns ``(id_col, clean_text, n_lines, n_kept, c4_keep)`` —
    ``clean_text`` is the kept lines re-joined with newlines (empty
    string when nothing survives), so the output drops straight into the
    dedup/quality stages.

    Plan shape: pure higher-order functions over the line array — every
    lambda touches only its element (no outer-expression re-evaluation),
    no explode, no shuffle; one codegen'd projection over the scan at
    any scale."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(c, "\n")

    def _keep(ln: Column) -> Column:
        t = F.trim(ln)
        words = F.size(F.split(t, _WS))
        cond = (
            (t != "")
            & (words >= min_words)
            & F.substring(F.rtrim(ln), -1, 1).isin(*C4_TERMINAL_CHARS)
        )
        for term in C4_LINE_BLOCKLIST:
            cond = cond & ~F.contains(F.lower(ln), F.lit(term))
        return cond

    kept = F.filter(lines, _keep)
    doc_blocked = F.lit(False)
    for term in C4_DOC_BLOCKLIST:
        doc_blocked = doc_blocked | F.contains(F.lower(c), F.lit(term))
    n_kept = F.size(kept).cast("long")
    # deliberately NOT rebalanced (r6): the zero-shuffle plan property is
    # asserted (test_plan_quality) and the per-row HOF filter is cheap —
    # an exchange would cost more than the single-split scan it spreads
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.alias("n_kept"),
        (~doc_blocked & (n_kept >= min_kept_lines)).alias("c4_keep"),
    )


def top_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    top_k: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Corpus-wide most frequent word n-grams — vocabulary induction and
    boilerplate discovery (the corpus-level companion of the per-doc
    :func:`repetition_stats`; the grams this surfaces are what hot-key
    caps and blocklists get seeded with).

    Returns ``(gram, n_docs, n_occurrences)``, ordered deterministically
    (count desc, gram asc), limited to ``top_k``.

    Plan: grams are built doc-locally (ZERO shuffle before the
    aggregate) — the token array is materialized behind an
    explode(array(...)) generator barrier so the tokenizer runs once per
    doc (CollapseProject would otherwise re-inline it per gram), then
    ONE map-combinable (gram) aggregate carries a count and a
    distinct-doc count → global top-k, which Spark executes as
    per-partition TakeOrdered + a singleton merge of k rows — the full
    gram table never reaches the driver or a single task."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    # Generator barrier: the child Project (doc id + tokenizer) is
    # evaluated once per input row; `__t` below is a stored attribute,
    # so the element_at references inside the gram lambda are O(1).
    # Rebalance small single-split inputs first so the tokenizer + gram
    # explode parallelize (estimate-gated no-op at scale; the synthetic
    # __d doc ids stay unique per row under any partitioning, so the
    # per-gram distinct-doc counts are unchanged).
    df = balance_small_input(df)
    docs = df.select(
        F.monotonically_increasing_id().alias("__d"),
        F.explode(F.array(F.transform(ws_tokens(text_col), F.lower))).alias("__t"),
    )
    t = F.col("__t")
    gram_arr = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + F.lit(j)) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select("__d", F.explode(gram_arr).alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(
            F.count_distinct("__d").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )
        .where(F.col("n_occurrences") >= min_count)
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
        .limit(top_k)
    )


#: PII patterns, ordered by application precedence (most specific first —
#: an SSN would otherwise be half-eaten by the looser phone pattern).
#: Deliberately lookaround-free and ASCII-explicit: Java regex (Spark)
#: and RE2 (DuckDB) agree on every construct used here (classes,
#: bounded repeats, non-capturing groups, \b word boundaries); RE2 has
#: no lookbehind, so none is used.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]"),
)


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction — the compliance stage every training-data pipeline
    runs before text leaves the raw zone: emails, SSNs, IPv4 addresses
    and phone-shaped digit runs are replaced by ``<TYPE>`` tokens, with
    a per-type match count.

    Counts are taken ON THE INPUT OF EACH STAGE (after the previous,
    more-specific replacements), so an SSN counts once as ``n_ssn`` and
    never again as a phone; replacement tokens contain no digits, so a
    redaction can never create a new match for a later pattern.

    Pure ``regexp_count``/``regexp_replace`` chains — JVM-side, codegen,
    zero shuffle at any scale — and every pattern is Java/RE2-identical
    by construction, so the DuckDB twin recomputes the same counts and
    the same scrubbed bytes."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    counts = {}
    for name, pat in PII_PATTERNS:
        counts[name] = F.regexp_count(c, F.lit(pat)).cast("long")
        c = F.regexp_replace(c, pat, f"<{name.upper()}>")
    has_pii = F.lit(False)
    for name, _ in PII_PATTERNS:
        has_pii = has_pii | (counts[name] > 0)
    # the regex chain is scan-stage per-row work; rebalance small
    # single-split inputs (estimate-gated no-op at scale)
    df = balance_small_input(df)
    return df.select(
        F.col(id_col),
        c.alias("clean_text"),
        *[counts[name].alias(f"n_{name}") for name, _ in PII_PATTERNS],
        has_pii.alias("has_pii"),
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts (whole lowercased tokens)."""
    return {lang: stopword_count(col, words) for lang, words in STOPWORDS.items()}


def lang_id(col: Column | str) -> Column:
    """Argmax language by stopword hits; 'und' when all scores are zero.
    Ties break by fixed language order (en, de, fr, es) — deterministic."""
    scores = lang_scores(col)
    order = ["en", "de", "fr", "es"]
    best = F.greatest(*[scores[lang] for lang in order])
    # built reversed so the FIRST language in `order` is the outermost
    # when() — earlier languages win ties deterministically.
    result = F.lit("und")
    for lang in reversed(order):
        result = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(result)
    return result


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercased text.
    (md5 exists in both Spark and DuckDB → value-level oracle checks;
    xxhash64 would be Spark-only.)"""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.lower(F.regexp_replace(F.trim(F.coalesce(c, F.lit(""))), _WS, " "))
    return F.md5(normalized)


def winnow_normalized(col: Column | str) -> Column:
    """The shared winnowing text normalization (JVM-side): collapse
    whitespace runs to one space, trim, lowercase.  Collapse-THEN-trim:
    SQL trim strips only 0x20, so a tabs-only doc would otherwise
    normalize to " " and fingerprint non-empty.  Factored out so the
    pandas scale path hashes EXACTLY the string the JVM forms produce —
    normalization parity by construction, not by re-implementation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(F.coalesce(c, F.lit("")), _WS, " ")))


def _winnow_doc_numpy(s: str, k: int, w: int):
    """Fingerprint set of ONE normalized document: md5_long60 per k-gram,
    numpy sliding-window minimum, sorted distinct int64s.  Matches the
    JVM forms bit-for-bit: digest[:8] big-endian >> 4 == the first 15 hex
    chars of md5 as an integer (= ``md5_long60``)."""
    import hashlib

    import numpy as np

    if not s:
        return np.empty(0, dtype=np.int64)
    n = max(len(s) - (k - 1), 1)
    md5 = hashlib.md5
    if s.isascii():  # byte slicing: no per-gram encode
        b = s.encode()
        digs = b"".join(md5(b[i : i + k]).digest()[:8] for i in range(n))
    else:  # substring counts CHARS (Spark semantics): slice str, then encode
        digs = b"".join(md5(s[i : i + k].encode("utf-8")).digest()[:8] for i in range(n))
    h = (np.frombuffer(digs, dtype=">u8") >> np.uint64(4)).astype(np.int64)
    if n < w:  # 1..w-1 grams -> a single window over everything
        fps = h.min(keepdims=True)
    else:
        fps = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
    return np.unique(fps)  # sorted distinct, = array_sort(array_distinct(..))


def winnow_fingerprint_set(col: Column | str, k: int = 8, w: int = 4) -> Column:
    """Winnowing fingerprint set as ``array<long>`` — the ZERO-SHUFFLE
    scale path (VERDICT r3 #1): normalization stays a JVM expression
    (:func:`winnow_normalized`), then ONE vectorized pandas UDF computes
    the per-doc set with a numpy sliding-window minimum.

    Why this beats both prior forms at 100 TB: the pure-array form
    re-evaluates the outer expression per element under interpreted HOFs
    (O(len^2)/doc); the explode + window-min rows form is codegen'd but
    its window exchange carries one (id, pos, 8-byte hash) row per
    CHARACTER of the corpus — ~25x the input bytes through a shuffle.
    Here the fingerprints are computed where the text already lives: the
    only data movement is the Arrow batch hop to the Python worker on the
    same executor, and what survives is the selected set (~2/(w+1) of the
    gram count).  Empty/NULL text -> empty array (same edge semantics as
    :func:`winnow_fingerprints`, equivalence-tested)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _winnow_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda t: _winnow_doc_numpy(t, k, w))

    return _winnow_udf(winnow_normalized(col))


#: Inputs smaller than this are round-robin rebalanced before a per-doc
#: UDF; larger inputs already carry enough scan splits.
_BALANCE_MAX_BYTES = 256 << 20


def balance_small_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition a SMALL input to full parallelism before an
    expensive per-row compute (the pandas winnowing UDF).

    Rationale: pandas-UDF parallelism equals input-split count.  A small
    single-file table arrives as ONE split, serializing the whole corpus
    through one Python worker (measured: sf0.1 documents = one 0.6 MB
    file -> 1 task -> 1.6 s where 32 tasks need ~0.2 s).  At corpus scale
    the scan has thousands of row-group splits and balancing would be a
    full-corpus shuffle — so this is a no-op unless the optimizer's size
    estimate is BOTH real (not the unknown-stats sentinel) and under
    ~256 MB, i.e. the shuffle is guaranteed trivial next to the compute."""
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return df
    sc = df.sparkSession.sparkContext
    if 0 < est < _BALANCE_MAX_BYTES:
        return df.repartition(sc.defaultParallelism)
    return df


def winnow_fingerprint_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    method: str = "pandas",
) -> DataFrame:
    """Winnowing fingerprints as DISTINCT ``(id_col, fp)`` rows.

    ``method='pandas'`` (default, the scale path): per-doc sets from
    :func:`winnow_fingerprint_set` (vectorized numpy sliding-min, ZERO
    shuffle), exploded to rows.  ``method='window'``: the pure-JVM
    alternative — normalize once per row → ``posexplode`` gram positions →
    ``md5_long60`` per gram (whole-stage codegen) → window MIN over the
    next ``w`` grams → distinct.  Its window exchange carries only
    (id, pos, 8-byte hash) — the TEXT never shuffles — but that is one
    row per CHARACTER of the corpus, which is why pandas is the default
    (VERDICT r3 #1).  Both are equivalence-tested against a pure-hashlib
    reference and against each other.

    Empty/NULL text keeps one ``(id, NULL)`` row (``explode_outer`` /
    the window form's sequence-when-null), so downstream ``COUNT(fp)``
    semantics match the SQL oracle's ``[NULL]``-substitution."""
    if method == "pandas":
        return balance_small_input(df).select(
            id_col,
            F.explode_outer(winnow_fingerprint_set(text_col, k, w)).alias("fp"),
        )
    if method != "window":
        raise ValueError(f"unknown winnowing method {method!r} (pandas|window)")
    from featherstore_spark.functions.hashing import md5_long60

    s = winnow_normalized(text_col)
    length = F.length(s)
    n = F.when(length == 0, F.lit(0)).otherwise(
        F.greatest(length - (k - 1), F.lit(1))
    )
    base = df.select(F.col(id_col), s.alias("__s"), n.alias("__n"))
    grams = base.select(
        id_col,
        "__n",
        F.explode_outer(
            F.when(F.col("__n") >= 1, F.sequence(F.lit(1), F.col("__n")))
        ).alias("__i"),
        # hash computed HERE, pre-window: only (id, __i, __n, 8-byte __h)
        # reach the window exchange; __s is pruned before the shuffle
        md5_long60(F.substring(F.col("__s"), F.col("__i"), F.lit(k))).alias("__h"),
    )
    from pyspark.sql import Window

    win = (
        Window.partitionBy(id_col)
        .orderBy("__i")
        .rowsBetween(Window.currentRow, w - 1)
    )
    m = F.greatest(F.col("__n") - (w - 1), F.lit(1))
    return (
        grams.withColumn("fp", F.min("__h").over(win))
        # windows starting past m would re-select suffix minima the paper's
        # scheme does not emit; NULL __i (empty doc) must survive
        .where((F.col("__i") <= m) | F.col("__i").isNull())
        .select(id_col, "fp")
        .distinct()
    )


def winnow_fingerprints(col: Column | str, k: int = 8, w: int = 4) -> Column:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003):
    rolling character ``k``-gram hashes, minimum per window of ``w``
    consecutive grams, sorted distinct selected hashes as ``array<long>``.

    Unlike :func:`fingerprint` (whole-document md5 → exact dedup only),
    the winnowed set is position-robust: two documents sharing any
    ``k + w - 1``-char run share a fingerprint, so overlap on the selected
    sets localizes partial copies (the guarantee the paper proves).

    CONVENIENCE form for small documents/corpora: interpreted HOF
    execution re-evaluates the outer normalization per element, so cost
    grows O(len^2) per document — corpus-scale pipelines must use
    :func:`winnow_fingerprint_rows` (explode + window-min, codegen,
    hash-only shuffle), which produces the identical fingerprint set
    (equivalence-tested).

    Edge semantics (pinned by tests + the SQL oracle): NULL/empty text →
    empty array; text with 1 ≤ n < ``w`` grams → one window over all
    grams (slice past the array end pads with nulls; ``least`` skips
    them); text shorter than ``k`` chars but non-empty → its single
    sub-``k`` gram hashes as-is (n is clamped to ≥ 1)."""
    from featherstore_spark.functions.hashing import md5_long60

    s = winnow_normalized(col)
    length = F.length(s)
    # number of k-grams; a non-empty doc shorter than k still has 1 gram
    n = F.when(length == 0, F.lit(0)).otherwise(
        F.greatest(length - (k - 1), F.lit(1))
    )
    hashes = F.when(n >= 1, F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: md5_long60(F.substring(s, i, F.lit(k))),
    )).otherwise(F.array().cast("array<long>"))
    # number of windows; 1..w-1 grams → a single window over everything
    m = F.when(n >= 1, F.greatest(n - (w - 1), F.lit(1))).otherwise(F.lit(0))
    shifted = [F.slice(hashes, F.lit(j + 1), m) for j in range(w)]
    mins = shifted[0]
    for nxt in shifted[1:]:
        mins = F.zip_with(mins, nxt, lambda a, b: F.least(a, b))
    return F.when(n >= 1, F.array_sort(F.array_distinct(mins))).otherwise(
        F.array().cast("array<long>")
    )


# --------------------------------------------------------------------------
# Model-shaped quality scoring: hashed linear classifier + char-bigram LM
# --------------------------------------------------------------------------

def hashed_linear_score(
    col: Column | str, seed: int = 42, salt: str = "qc"
) -> tuple[Column, Column]:
    """fastText-shaped hashed-unigram linear scorer: lowercase whitespace
    tokens, each hashed to a weight in [-1, 1], score = mean weight.

    The PLUMBING is the production shape — tokenize → hash → weight →
    mean is exactly what a learned linear quality classifier (CCNet /
    LLaMA wiki-ref style) runs at inference, all JVM-side HOFs with zero
    shuffle.  The WEIGHTS are md5-derived deterministic stand-ins (this
    sandbox ships no model artifacts); swapping in learned weights is a
    one-line change (replace the hash-weight lambda with a broadcast
    map lookup).  Weight = (md5_long60(salt||token) % 2001 - 1000)/1000
    — integer arithmetic then one exact small-int division, so Spark and
    the DuckDB twin agree bit-for-bit.

    Returns (score, n_tokens); score is rounded to 6 and is 0.0 for
    empty/NULL text (no tokens — neutral, not NULL, so downstream
    threshold filters keep deterministic behavior)."""
    from featherstore_spark.functions.hashing import md5_long60

    c = F.col(col) if isinstance(col, str) else col
    toks = ws_tokens(F.lower(c))
    tag = f"{salt}:{seed}:"
    weights = F.transform(
        toks,
        lambda t: (md5_long60(F.concat(F.lit(tag), t)) % F.lit(2001) - F.lit(1000))
        / F.lit(1000.0),
    )
    n = F.size(toks)
    total = F.aggregate(weights, F.lit(0.0), lambda a, x: a + x)
    score = F.when(n > 0, F.round(total / n, 6)).otherwise(F.lit(0.0))
    return score, n.cast("long")


def quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-doc hashed-linear quality score + keep flag (score >= threshold,
    compared on the ROUNDED score so the cut is engine-independent)."""
    score, n = hashed_linear_score(text_col, seed=seed)
    return df.select(
        F.col(id_col),
        score.alias("q_score"),
        (score >= F.lit(float(threshold))).alias("keep"),
        n.alias("n_tokens"),
    )


def char_bigram_grams(col: Column | str) -> Column:
    """Array of character bigrams of the winnow-normalized text (shared
    normalization => same string both engines); < 2 chars → empty.

    PERF CAVEAT: only apply this to a column that is ALREADY the
    normalized string (or accept the cost): expressions embedded in a
    HOF lambda are re-evaluated per element, so passing raw text makes
    the normalization regex run once PER CHARACTER (measured 15 s for a
    1.5 MB corpus vs ~1 s with the normalization materialized first —
    char_bigram_lm does the latter)."""
    s = F.col(col) if isinstance(col, str) else col
    n = F.length(s) - 1
    return F.when(
        n >= 1,
        F.transform(F.sequence(F.lit(1), n), lambda i: s.substr(i, F.lit(2))),
    ).otherwise(F.array().cast("array<string>"))


def char_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 256,
) -> DataFrame:
    """CCNet-style perplexity quality signal from a char-bigram LM
    trained on the corpus itself (self-perplexity; CCNet scores against
    a wiki LM — with an external model unavailable here, the corpus LM
    is the honest stand-in and the plumbing is identical).

    Train: ONE map-combinable groupBy over exploded bigrams (the shuffle
    carries per-task distinct grams, never the text); the top
    ``vocab_size`` grams by (count DESC, gram ASC) come to the driver —
    O(vocab) state — and their log-probs ln(count/N) become a broadcast
    vocab table.  OOV mass is ln(0.5/N).

    Score: explode grams → BROADCAST-join the tiny vocab → one
    map-combinable groupBy(doc) for the mean log-prob.  (The first cut
    looked cheaper on paper — a literal-map lookup folded over the gram
    array, zero shuffle — but Catalyst rebuilds a literal map/array
    constructor PER ROW inside HOF lambdas: measured 59 s vs ~3 s at
    sf0.1.  The join plan is the standard 'broadcast the small dim'
    shape and its one shuffle carries doc-id partials only.)
    Outputs (id, n_grams, avg_nll, ppl) with avg_nll/ppl rounded to 6;
    empty docs score NULL.  The SQL twin recomputes the same vocab and
    formula (same-host libm, exact-int inputs) via the same
    unnest+join — float sum-order noise (~1e-13) is far inside the
    round-6 grid."""
    import math

    # materialize the normalized string BEFORE gramming — and force it
    # with localCheckpoint: a plain two-step select gets project-
    # collapsed by Catalyst, re-inlining the normalization regex into
    # the transform lambda where it re-runs once PER CHARACTER
    # (measured 15 s -> 0.9 s at sf0.1).  The checkpoint also serves
    # both the train and score passes (one normalization, one gram
    # build, read twice) — the artifact a real pipeline would persist.
    # Rebalance single-file corpora first (estimate-gated no-op at
    # scale).
    norm = (
        balance_small_input(df)
        .select(F.col(id_col), winnow_normalized(text_col).alias("__s"))
        .localCheckpoint(eager=True)
    )
    gsrc = norm.select(F.col(id_col), char_bigram_grams("__s").alias("__grams"))
    # TWO driver jobs read cnts (total mass + top-V vocab); checkpoint it
    # so the gram explode + aggregate runs once — the table is O(distinct
    # bigrams), tiny at any corpus scale
    cnts = (
        gsrc.select(F.explode("__grams").alias("g"))
        .groupBy("g")
        .count()
        .localCheckpoint(eager=True)
    )
    n_total = cnts.agg(F.sum("count").alias("n")).collect()[0]["n"]
    if not n_total:
        return df.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_grams"),
            F.lit(None).cast("double").alias("avg_nll"),
            F.lit(None).cast("double").alias("ppl"),
        )
    top = cnts.orderBy(F.col("count").desc(), F.col("g").asc()).limit(vocab_size).collect()
    spark = df.sparkSession
    vocab_df = spark.createDataFrame(
        [(r["g"], math.log(r["count"] / n_total)) for r in top], "g: string, logp: double"
    )
    oov = math.log(0.5 / n_total)
    exploded = gsrc.select(F.col(id_col), F.explode("__grams").alias("g"))
    scored = (
        exploded.join(F.broadcast(vocab_df), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("logp"), F.lit(oov))).alias("lsum"),
        )
    )
    avg = F.col("lsum") / F.col("n_grams")
    return (
        df.select(F.col(id_col)).join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.round(-avg, 6).alias("avg_nll"),
            F.round(F.exp(-avg), 6).alias("ppl"),
        )
    )


def tokenize_ids(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 512,
) -> DataFrame:
    """Corpus-induced vocabulary encoding: lowercased BPE-ish lexer
    tokens (``BPE_TOKEN_RE`` — ASCII-explicit, Java/RE2 identical), the
    top ``vocab_size`` tokens by (count DESC, token ASC) become ids
    0..V-1, everything else encodes as the OOV id V.  The id arrays are
    what ``operators/packing.pack_sequences`` concatenates into training
    windows; with a real learned BPE the merges table would replace the
    induced vocab and the plumbing below is unchanged.

    Train: one map-combinable token count (the shuffle carries per-task
    distinct tokens), top-V to the driver — O(vocab) state.  Encode:
    posexplode → BROADCAST vocab join → per-doc reassembly via
    sort_array(collect_list(struct(pos, id))) — the join pattern, not a
    literal map (Catalyst rebuilds literal maps per row inside HOF
    lambdas; see SURVEY §4 pitfalls).  Output (id, token_ids, n_tokens,
    oov_frac round-6); empty docs get empty arrays, not NULL."""
    # F.lit pattern, NOT an F.expr-embedded string — Spark SQL string
    # literals process backslash escapes, which would corrupt the \s
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(BPE_TOKEN_RE), F.lit(0)
    )
    # two consumers (vocab count + encode): run the regex lexer ONCE —
    # the same multi-consumer localCheckpoint discipline (and single-file
    # rebalance) as char_bigram_lm above
    src = (
        balance_small_input(df)
        .select(F.col(id_col), toks.alias("__toks"))
        .localCheckpoint(eager=True)
    )
    cnts = src.select(F.explode("__toks").alias("t")).groupBy("t").count()
    top = cnts.orderBy(F.col("count").desc(), F.col("t").asc()).limit(vocab_size).collect()
    spark = df.sparkSession
    vocab_df = spark.createDataFrame(
        [(r["t"], i) for i, r in enumerate(top)], "t: string, tid: int"
    )
    oov_id = len(top)
    pos = src.select(F.col(id_col), F.posexplode("__toks").alias("pos", "t"))
    enc = (
        pos.join(F.broadcast(vocab_df), "t", "left")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("pos"),
                            F.coalesce(F.col("tid"), F.lit(oov_id)).alias("tid"),
                        )
                    )
                ),
                lambda s: s.getField("tid"),
            ).alias("token_ids"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("tid").isNull().cast("int")) / F.count(F.lit(1)), 6
            ).alias("oov_frac"),
        )
    )
    return (
        df.select(F.col(id_col)).join(enc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("token_ids", F.array().cast("array<int>")).alias("token_ids"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("oov_frac", F.lit(0.0)).alias("oov_frac"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Fixed-size overlapping document chunking — the context-window prep
    step between corpus cleaning and embedding/indexing (RAG ingestion,
    long-doc eval slicing).  Chunk ``i`` covers characters
    ``[1 + i·stride, 1 + i·stride + chunk_chars)`` with
    ``stride = chunk_chars − overlap``; the last chunk is the first one
    that reaches the end of the document (it may be shorter), so every
    character belongs to ≥1 chunk and consecutive chunks share exactly
    ``overlap`` chars.  Empty/NULL text → one empty chunk (total, like
    pii_scrub's NULL convention — a lost row is the worse bug).

    Returns (id_col, chunk_idx, chunk_text, n_chunks).

    Plan shape: one codegen'd ``sequence``+``explode`` over the scan and a
    per-row ``substring`` — zero shuffle at any scale, output rows ≈
    corpus_chars / stride.  Deterministic pure arithmetic, so the DuckDB
    twin reproduces every chunk byte-for-byte."""
    chunk_chars, overlap = int(chunk_chars), int(overlap)
    if chunk_chars <= 0:
        raise ValueError(f"chunk_chars must be positive, got {chunk_chars}")
    if not (0 <= overlap < chunk_chars):
        raise ValueError(
            f"overlap must be in [0, chunk_chars), got {overlap} "
            f"(chunk_chars={chunk_chars}) — overlap >= chunk_chars never advances"
        )
    stride = chunk_chars - overlap
    t = F.coalesce(F.col(text_col), F.lit(""))
    # chunks needed so the LAST chunk reaches the end:
    # n = 1 + ceil(max(len - chunk_chars, 0) / stride), total for len = 0
    extra = F.greatest(F.length(t) - F.lit(chunk_chars), F.lit(0))
    n_chunks = (F.lit(1) + F.ceil(extra / F.lit(stride))).cast("long")
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
        t.alias("__t"),
        n_chunks.alias("n_chunks"),
    ).select(
        id_col,
        "chunk_idx",
        F.substring(
            F.col("__t"),
            (F.col("chunk_idx") * stride + 1).cast("int"),
            F.lit(chunk_chars),
        ).alias("chunk_text"),
        "n_chunks",
    )
