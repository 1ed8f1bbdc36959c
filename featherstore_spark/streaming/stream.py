"""Structured Streaming counterparts of the batch windowed operators.

The reference has no streaming (request-driven batch ingestion only,
/root/reference/pkg/flight/server.go:352-408; SURVEY §2.9).  The batch
operators in this engine were deliberately designed on watermark-
compatible primitives, so their streaming twins are one-liners:

- A1 tumbling aggregates  -> window() + watermark
- W4 gap sessionization   -> session_window(ts, gap) + watermark
- ingest validation       -> same schema contract on readStream

Late data: rows older than the watermark relative to max event time are
dropped from aggregates — the streaming analogue of the backfill path
(late rows in batch go through checkpoint-resumed re-materialization of
their partitions instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from featherstore_spark.schema import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str, max_files: int = 64) -> DataFrame:
    """File-source transcript stream with the declared schema (schema
    enforcement at the ingest boundary, as batch validate_transcripts)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_tumbling_aggregates(
    stream: DataFrame,
    width: str = "5 minutes",
    watermark: str = "30 minutes",
    entity_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of windows.tumbling_aggregates (same output names)."""
    win = F.window(F.col(ts_col), width)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(entity_col), win.start.alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("tool").isNotNull().cast("int")).alias("n_tool_calls"),
            F.round(F.avg(F.col("tool").isNotNull().cast("int")), 6).alias("tool_rate"),
            # exact distinct is unsupported on streaming aggregates
            F.approx_count_distinct("role").alias("n_roles_approx"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("text_chars"),
        )
    )


def streaming_sessions(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    entity_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of sessionize.session_aggregates using the native
    ``session_window`` (gap-merged windows; same gap semantics: a row at
    exactly gap distance extends the session)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(entity_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("tool").isNotNull().cast("int")).alias("n_tool_calls"),
            F.approx_count_distinct("role").alias("n_roles_approx"),
        )
        .select(
            entity_col,
            F.col("session_window.start").alias("session_start"),
            "n_turns",
            "n_tool_calls",
            "n_roles_approx",
        )
    )


def streaming_cumulative_features(
    stream: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    out_of_order: str = "error",
    max_buffer: int = 10_000,
) -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``:
    per-conversation running counters (cum_turns, cum_tool_calls — the
    same cumulative features batch ``turn_features`` computes with an
    unbounded-preceding window) maintained in per-key GroupState across
    micro-batches.

    This is the pattern for operators Spark's windowed streaming
    aggregates cannot express (running per-row state emitted per input
    row).  State per key is three longs plus (in buffer mode) the pending
    reorder buffer — O(active conversations), not O(turns).

    Ordering contract, ENFORCED not assumed.  ``out_of_order``:

    - ``"error"`` (default): rows within a micro-batch are sorted by
      turn_idx; a later micro-batch delivering an already-consumed
      turn_idx raises immediately instead of silently producing wrong
      cumulative counters.  Out-of-order backfills go through the batch
      checkpoint path (plans/checkpoint.py), which recomputes whole
      buckets and cannot double-count.
    - ``"buffer"``: a reorder buffer rides per-key state — rows beyond a
      gap are HELD, and each batch emits exactly the maximal contiguous
      run of turn_idx continuing from the last consumed turn.  Output is
      then identical to in-order arrival regardless of inter-batch
      shuffling.  Requires DENSE per-conversation turn_idx (0,1,2,...),
      which the transcript schema guarantees; a duplicate turn or a
      buffer exceeding ``max_buffer`` rows (a hole that never fills)
      still raises — unbounded silent buffering is just the silent-wrong
      failure mode wearing a different hat.
    """
    if out_of_order not in ("error", "buffer"):
        raise ValueError(f"out_of_order must be 'error' or 'buffer', got {out_of_order!r}")

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField(entity_col, T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField("cum_turns", T.LongType()),
            T.StructField("cum_tool_calls", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("cum_turns", T.LongType()),
            T.StructField("cum_tool_calls", T.LongType()),
            T.StructField("max_turn_idx", T.LongType()),
            # reorder buffer (empty in "error" mode): parallel arrays keep
            # the state schema flat/fixed — ts as epoch µs longs
            T.StructField("buf_turn", T.ArrayType(T.LongType())),
            T.StructField("buf_ts", T.ArrayType(T.LongType())),
            T.StructField("buf_tool", T.ArrayType(T.BooleanType())),
        ]
    )

    def _emit(key, pdf, turns, tools):
        import numpy as np

        is_tool = pdf["tool_flag"].astype("int64")
        return pd.DataFrame(
            {
                entity_col: key[0],
                "turn_idx": pdf["turn_idx"].astype("int32"),
                ts_col: pdf[ts_col],
                "cum_turns": turns + np.arange(1, len(pdf) + 1, dtype="int64"),
                "cum_tool_calls": tools + is_tool.cumsum(),
            }
        )

    def update(key, pdfs, state: GroupState):
        turns, tools, max_seen, bt, bts, btool = (
            state.get if state.exists else (0, 0, -1, [], [], [])
        )
        # reset_index after the sort: DataFrame construction aligns Series
        # by index, so sorted Series + positional arrays would interleave
        pdf = (
            pd.concat(list(pdfs), ignore_index=True)
            .sort_values("turn_idx")
            .reset_index(drop=True)
        )
        if len(pdf) == 0:  # pragma: no cover - NoTimeout never calls with empty
            return
        pdf["tool_flag"] = pdf["tool"].notna()
        # pin ns resolution: pandas 2 + Arrow may deliver datetime64[us],
        # and the buffer round-trips ts through epoch integers
        pdf[ts_col] = pdf[ts_col].astype("datetime64[ns]")

        if out_of_order == "error":
            # fail LOUDLY on out-of-order arrival across micro-batches (and
            # on a replayed/duplicated turn): silent wrong counters are the
            # worst failure mode of running state
            first = int(pdf["turn_idx"].iloc[0])
            if first <= max_seen or pdf["turn_idx"].duplicated().any():
                # the duplicated() check mirrors buffer mode (ADVICE r3): a
                # turn_idx repeated WITHIN one micro-batch would otherwise
                # pass the cross-batch max_seen check and double-count
                raise ValueError(
                    f"out-of-order or duplicate arrival for {key}: turn_idx "
                    f"{first} after already-consumed turn_idx {max_seen}, or a "
                    "turn_idx repeated within the batch; replay/backfill must "
                    "go through the batch checkpoint path (plans/checkpoint.py)"
                )
            out = _emit(key, pdf, turns, tools)
            state.update((turns + len(pdf), tools + int(pdf["tool_flag"].sum()),
                          int(pdf["turn_idx"].iloc[-1]), [], [], []))
            yield out
            return

        # buffer mode: merge buffered + incoming, emit the maximal
        # contiguous run from max_seen + 1, hold the rest
        buf = pd.DataFrame({
            "turn_idx": pd.Series(bt, dtype="int64"),
            ts_col: pd.to_datetime(pd.Series(bts, dtype="int64"), unit="us"),
            "tool_flag": pd.Series(btool, dtype="bool"),
        })
        merged = (
            pd.concat(
                [buf, pdf[["turn_idx", ts_col, "tool_flag"]]], ignore_index=True
            )
            .sort_values("turn_idx")
            .reset_index(drop=True)
        )
        ti = merged["turn_idx"].astype("int64")
        if int(ti.iloc[0]) <= max_seen or ti.duplicated().any():
            raise ValueError(
                f"duplicate/replayed turn for {key}: turn_idx "
                f"{int(ti.iloc[0])} vs consumed {max_seen} — replay must go "
                "through the batch checkpoint path (plans/checkpoint.py)"
            )
        # contiguous prefix: positions where turn_idx == max_seen+1+position
        contiguous = (ti.to_numpy() == max_seen + 1 + np.arange(len(ti))).cumprod().astype(bool)
        ready, held = merged[contiguous], merged[~contiguous]
        if len(held) > max_buffer:
            raise ValueError(
                f"reorder buffer for {key} exceeds max_buffer={max_buffer} "
                f"({len(held)} rows held waiting for turn_idx {max_seen + len(ready) + 1}) "
                "— the gap turn likely never arrived; backfill via the batch "
                "checkpoint path (plans/checkpoint.py)"
            )
        new_state = (
            turns + len(ready),
            tools + int(ready["tool_flag"].sum()),
            max_seen + len(ready),
            held["turn_idx"].astype("int64").tolist(),
            (held[ts_col].astype("int64") // 1000).tolist(),  # ns -> µs
            held["tool_flag"].tolist(),
        )
        state.update(new_state)
        if len(ready):
            yield _emit(key, ready, turns, tools)

    return stream.groupBy(entity_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming twin of operators/dedup.exact_duplicates' DROP side:
    first-arrival-wins on the normalized md5 content fingerprint, with
    state bounded by the watermark (``dropDuplicatesWithinWatermark``
    evicts fingerprints older than the watermark — O(active window)
    state, the only state bound that survives an unbounded corpus; a
    plain ``dropDuplicates`` would grow state forever).

    Semantics note vs batch: batch keeps the MIN-id representative of
    each duplicate class; a stream cannot see the future, so it keeps
    the FIRST ARRIVAL — identical output whenever ingestion is id/time
    ordered, and the standard streaming dedup contract otherwise.  A
    duplicate arriving after its fingerprint's state expired is re-
    emitted (watermark trade-off); the terminal batch dedup over the
    materialized corpus remains the exactness backstop, exactly like
    the backfill path for late rows."""
    from featherstore_spark.functions.text import fingerprint

    return (
        stream.withColumn("fp", fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .drop("fp")
    )


def streaming_kmv_distinct(
    stream: DataFrame,
    col: str,
    keys: list[str] | None = None,
    width: str = "5 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    k: int = 64,
) -> DataFrame:
    """Windowed distinct-count via the deterministic KMV sketch — the
    exact-verifiable replacement for ``approx_count_distinct`` in
    streaming aggregates (HLL estimates differ per engine AND per
    merge order; the k smallest distinct md5 hashes are one set
    regardless of arrival order, so streaming output == batch output,
    tested).

    Plan shape: event time is quantized to the window start JVM-side
    (epoch-aligned — identical to ``F.window``'s buckets), one Arrow
    pass per micro-batch emits per-(keys, window) partial sketches
    (≤ k longs each, operators/sketch partials), and the streaming
    aggregation merges bounded arrays.  State per open (keys, window)
    group is O(triggers_in_window × k) longs — bounded because the
    watermark closes windows; the applyInPandasWithState variant would
    hold exactly k (streaming_cumulative_features shows that pattern)
    at the cost of manual timers, which this sketch does not need.

    Emits (window_start, keys…, sketch_size, est_distinct) on window
    close (append mode)."""
    from featherstore_spark.functions.time import epoch_us, interval_to_us
    from featherstore_spark.operators.sketch import (
        _kmv_partials_gen,
        kmv_estimate,
        kmv_merge_agg,
    )

    keys = list(keys or [])
    w_us = interval_to_us(width)
    bucket = F.timestamp_micros((F.floor(epoch_us(ts_col) / w_us) * w_us).cast("long"))
    src = stream.select(
        *keys, bucket.alias("window_start"), F.col(col).cast("string").alias("__v")
    )
    gkeys = keys + ["window_start"]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.schema if f.name != "__v"
    )
    partials = src.mapInPandas(
        _kmv_partials_gen(gkeys, k), schema=f"{schema}, partial array<long>"
    )
    merged = (
        partials.withWatermark("window_start", watermark)
        .groupBy(*keys, F.window("window_start", width).alias("w"))
        .agg(kmv_merge_agg("partial", k))
    )
    return merged.select(
        F.col("w.start").alias("window_start"),
        *keys,
        F.size("sketch").cast("long").alias("sketch_size"),
        kmv_estimate("sketch", k).alias("est_distinct"),
    )


def streaming_histogram(
    stream: DataFrame,
    col: str,
    lo: float,
    hi: float,
    keys: list[str] | None = None,
    width: str = "5 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    bins: int = 128,
) -> DataFrame:
    """Windowed fixed-bin histogram — the streaming half of
    ``sketch.histogram_quantiles``.  A stream cannot run the batch
    operator's exact min/max pre-pass (that would need the whole
    unbounded input), so the bin edges are EXPLICIT inputs — which is
    also what makes shard/window histograms mergeable by plain count
    addition, and what a production deployment pins anyway (edges from
    yesterday's batch profile).  Same IEEE bin rule as batch:
    min(floor((x-lo)/w), bins-1), NULLs and out-of-range-below values
    excluded/clamped identically, so a closed window's histogram is
    BIT-EQUAL to the batch histogram over the same rows (tested).
    Emits (window_start, keys…, bin, n) on window close; feed the rows
    to ``sketch`` cumsum logic (or the batch operator) for quantiles.

    Values outside [lo, hi] clamp into the edge bins (0 / bins-1) —
    with EXPLICIT edges both tails can overflow, and clamping (rather
    than dropping) keeps every count so merged totals still equal row
    counts; the batch operator only ever clamps the top because its lo
    is the true data min."""
    keys = list(keys or [])
    w = (float(hi) - float(lo)) / bins
    x = F.col(col).cast("double")
    if w == 0.0:
        bin_expr = F.lit(0)
    else:
        bin_expr = F.greatest(
            F.lit(0),
            F.least(
                F.floor((x - F.lit(float(lo))) / F.lit(w)).cast("int"),
                F.lit(bins - 1),
            ),
        )
    return (
        stream.where(F.col(col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(*keys, F.window(ts_col, width).alias("w"), bin_expr.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), *keys, "bin", "n")
    )


def streaming_contamination_probe(
    doc_stream: DataFrame,
    words: list[int],
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 42,
    min_hits: int = 5,
) -> DataFrame:
    """Ingest-time near-dup / contamination gate: the streaming twin of
    ``dedup.bloom_contamination_hits``.  Each arriving document's
    winnowing fingerprint SET (the zero-shuffle pandas kernel — one
    Arrow batch per micro-batch partition) is probed against the
    broadcast Bloom filter of the indexed/benchmark side
    (``sketch.bloom_words``, 8 KiB literal), and the doc is flagged when
    ``min_hits`` or more of its fingerprints might be in the filter.

    Deliberately STATELESS — the property that makes it deployable at
    ingest: per-row column expressions only, so it runs in append mode
    with no watermark, no state store, no shuffle, and composes under
    any downstream streaming aggregation (Spark forbids stacking a
    second stateful aggregate; an exact stream-static join + two
    chained counts would hit exactly that wall).  Same no-false-negative
    contract as batch: a doc sharing >= min_hits true fingerprints with
    the filter side ALWAYS flags; false positives route to the exact
    batch pass (``dedup.cross_corpus_overlap`` or
    ``incremental_near_duplicates``) downstream.  Output: input columns
    + (bloom_hits long, flagged boolean) — bit-equal to the batch probe
    over the same rows (tested)."""
    from featherstore_spark.functions.text import winnow_fingerprint_set
    from featherstore_spark.operators.sketch import bloom_might_contain

    fps = F.coalesce(
        winnow_fingerprint_set(text_col, k, w), F.array().cast("array<long>")
    )
    hits = F.size(
        F.filter(
            fps,
            lambda fp: bloom_might_contain(fp, words, n_bits, n_hashes, seed),
        )
    ).cast("long")
    return doc_stream.withColumn("bloom_hits", hits).withColumn(
        "flagged", F.col("bloom_hits") >= min_hits
    )


def streaming_asof_state(
    tagged: DataFrame,
    feature_cols: list[str],
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    side_col: str = "side",
    prefix: str = "f_",
    tolerance: str | int | None = None,
) -> DataFrame:
    """TRUE streaming as-of join with O(1) state per entity — the online
    feature-store hot path: feature rows and spine (request) rows arrive
    interleaved in ONE tagged stream (``side_col`` = 'feature'/'spine';
    union two sources upstream), and every spine row is emitted enriched
    with the latest feature row at ts' <= ts SEEN SO FAR.  Unlike
    :func:`streaming_asof_enrich` (which re-reads a static feature table
    per micro-batch), this holds exactly ONE feature row per entity in
    GroupState — O(active entities) total, no rescans, which is the shape
    an online enricher needs at 10^12-turn scale.

    Ordering contract, ENFORCED not assumed (the
    streaming_cumulative_features discipline): within a micro-batch rows
    are sorted by (ts, feature-before-spine) so equal-ts features match
    inclusively, exactly like batch ``asof_join``; a micro-batch whose
    earliest row is OLDER than anything already consumed for that entity
    raises loudly — a late feature could invalidate already-emitted
    enrichments, and silent wrongness is worse than a crash.  The tie
    case is guarded separately: a feature whose ts EQUALS an
    already-emitted spine request also raises (batch as-of matches
    equal-ts features inclusively, so that enrichment is already wrong),
    while equal-ts arrivals that tie only other features or pending
    spines are accepted.  NULL ``ts`` raises (NaT would silently poison
    both guards).  Late / out-of-order backfills go through the batch
    checkpoint path.

    ``tolerance`` (feature TTL, same semantics as batch ``asof_join``):
    an interval string or µs width; a carry/match staler than
    ``spine.ts − tolerance`` is emitted as NULL (inclusive boundary).
    The state still holds the stale row — a fresh-enough spine later
    cannot exist (event time only advances), but TTL expiry must not
    destroy the ordering guard's memory.

    Output: (entity, ts, {prefix}{ts_col}, {prefix}{col}...) — one row
    per spine row; NULL features when no feature precedes the request
    (matches batch asof_join, equality-tested across batch splits and
    restarts)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from featherstore_spark.functions.time import interval_to_us

    tol_us = None
    if tolerance is not None:
        tol_us = interval_to_us(tolerance) if isinstance(tolerance, str) else int(tolerance)
        if tol_us < 0:
            raise ValueError(f"tolerance must be non-negative, got {tolerance!r}")

    in_fields = {f.name: f for f in tagged.schema.fields}
    missing = [c for c in (entity_col, ts_col, side_col, *feature_cols) if c not in in_fields]
    if missing:
        raise ValueError(f"streaming_asof_state: input lacks columns {missing}")
    feat_fields = [in_fields[c] for c in feature_cols]
    # state fields are written back with EXPLICIT python casts: the spine
    # rows' NULLs upcast the batch's feature-value columns to float64, and
    # a numpy float64 written into a LongType state field is silently
    # dropped by the state serializer (observed: carry ts survived, carry
    # values came back None) — the cast makes the round-trip total
    def _int_exact(v):
        # the mixed batch arrives float64; past 2^53 that representation
        # already lost the integer — corrupting state silently is the
        # worst outcome, so refuse (the batch as-of path handles any long)
        if isinstance(v, float) and abs(v) >= 2.0**53:
            raise ValueError(
                "streaming_asof_state: integer feature value magnitude >= 2^53 "
                f"({v!r}) is not float64-exact in a NULL-bearing tagged batch — "
                "cast the column to double/string upstream or use the batch as-of"
            )
        return int(v)

    _casters = []
    for f in feat_fields:
        if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            _casters.append(_int_exact)
        elif isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            _casters.append(float)
        elif isinstance(f.dataType, T.BooleanType):
            _casters.append(bool)
        elif isinstance(f.dataType, T.StringType):
            _casters.append(str)
        else:
            raise ValueError(
                f"streaming_asof_state: feature column {f.name!r} has type "
                f"{f.dataType.simpleString()} — only primitive feature values "
                "can ride per-entity state (cast or extract upstream)"
            )
    out_schema = T.StructType(
        [
            in_fields[entity_col],
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(f"{prefix}{ts_col}", T.TimestampType()),
            *[T.StructField(f"{prefix}{f.name}", f.dataType) for f in feat_fields],
        ]
    )
    # ts round-trips through epoch-µs longs (flat, fixed state schema)
    state_schema = T.StructType(
        [
            T.StructField("feat_ts_us", T.LongType()),
            T.StructField("max_seen_us", T.LongType()),
            T.StructField("max_spine_us", T.LongType()),
            *feat_fields,
        ]
    )

    def update(key, pdfs, state: GroupState):
        held = state.get if state.exists else (None, None, None, *[None] * len(feature_cols))
        feat_ts_us, max_seen_us, max_spine_us = held[0], held[1], held[2]
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:  # pragma: no cover - NoTimeout never calls with empty
            return
        pdf[ts_col] = pdf[ts_col].astype("datetime64[ns]")
        if pdf[ts_col].isna().any():
            raise ValueError(
                f"streaming_asof_state: NULL {ts_col} for {key} — a NaT would "
                "silently poison the ordering guard and the carry timestamp; "
                "filter or fix upstream"
            )
        pdf["__rank"] = (pdf[side_col] != "feature").astype("int8")
        bad = ~pdf[side_col].isin(["feature", "spine"])
        if bad.any():
            raise ValueError(
                f"streaming_asof_state: unknown {side_col} value "
                f"{pdf.loc[bad, side_col].iloc[0]!r} for {key} — expected "
                "'feature' or 'spine' (a typo would silently drop rows)"
            )
        pdf = pdf.sort_values([ts_col, "__rank"], kind="mergesort").reset_index(drop=True)
        first_us = int(pdf[ts_col].iloc[0].value // 1000)
        if max_seen_us is not None and first_us < max_seen_us:
            raise ValueError(
                f"out-of-order micro-batch for {key}: row at {pdf[ts_col].iloc[0]} "
                f"after already-consumed event time — a late feature would "
                "invalidate emitted enrichments; backfill via the batch "
                "checkpoint path (plans/checkpoint.py)"
            )

        spines = pdf[pdf[side_col] == "spine"][[ts_col]]
        feats = pdf[pdf[side_col] == "feature"][[ts_col, *feature_cols]]
        if len(feats) and max_spine_us is not None:
            f_first_us = int(feats[ts_col].iloc[0].value // 1000)
            # '<= emitted spine ts' (not just '<'): batch as-of matches an
            # equal-ts feature inclusively, so a feature tying an ALREADY
            # EMITTED spine is exactly as unrecoverable as an earlier one
            if f_first_us <= max_spine_us:
                raise ValueError(
                    f"late feature for {key}: feature at {feats[ts_col].iloc[0]} "
                    "ties or precedes an already-emitted spine request — its "
                    "enrichment is already wrong; backfill via the batch "
                    "checkpoint path (plans/checkpoint.py)"
                )
        if feat_ts_us is not None:
            carry = pd.DataFrame(
                {ts_col: pd.Series([pd.Timestamp(feat_ts_us * 1000)],
                                   dtype="datetime64[ns]"),
                 **{c: [v] for c, v in zip(feature_cols, held[3:])}}
            )
            # value dtypes may object-upcast when the carry holds a NULL —
            # harmless: they are carried through the as-of, never keyed
            feats = pd.concat([carry, feats], ignore_index=True)

        if len(feats):
            last = feats.iloc[-1]
            new_feat_ts_us = int(last[ts_col].value // 1000)
            new_vals = [
                None if pd.isna(v) else cast(v)
                for cast, v in zip(_casters, (last[c] for c in feature_cols))
            ]
        else:
            new_feat_ts_us, new_vals = None, [None] * len(feature_cols)
        if len(spines):
            new_max_spine_us = int(spines[ts_col].iloc[-1].value // 1000)
            if max_spine_us is not None:
                new_max_spine_us = max(new_max_spine_us, max_spine_us)
        else:
            new_max_spine_us = max_spine_us
        state.update((
            new_feat_ts_us,
            int(pdf[ts_col].iloc[-1].value // 1000),
            new_max_spine_us,
            *new_vals,
        ))
        if len(spines) == 0:
            return
        if len(feats):
            merged = pd.merge_asof(
                spines.sort_values(ts_col), feats.rename(columns={ts_col: f"{prefix}{ts_col}"}),
                left_on=ts_col, right_on=f"{prefix}{ts_col}",
                direction="backward", allow_exact_matches=True,
            )
        else:
            merged = spines.copy()
            merged[f"{prefix}{ts_col}"] = pd.NaT
            for c in feature_cols:
                merged[c] = None
        if tol_us is not None and len(merged):
            stale = (
                merged[ts_col] - merged[f"{prefix}{ts_col}"]
            ) > pd.Timedelta(tol_us, unit="us")
            merged.loc[stale, [f"{prefix}{ts_col}", *feature_cols]] = None
        merged.insert(0, entity_col, key[0])
        merged = merged.rename(columns={c: f"{prefix}{c}" for c in feature_cols})
        yield merged

    return tagged.groupBy(entity_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_asof_enrich(
    spine_stream: DataFrame,
    features: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    on: str = "conv_id",
    ts: str = "ts",
    strategy: str = "window",
    **asof_kwargs,
):
    """Online point-in-time enrichment: every arriving spine row is
    joined to the latest preceding feature row — the streaming half of
    the serving story (the reference serves point-in-time reads
    request-by-request over Flight, /root/reference/pkg/flight/
    server.go:250-256; this materializes the same answer continuously
    for a whole stream of (entity, ts) requests).

    Why ``foreachBatch`` and not a stream-static join: Spark's
    stream-static equi-join cannot express "latest row ≤ ts" (an as-of
    needs a per-key ordered reduction over the match set), so each
    micro-batch is enriched with the BATCH :func:`~featherstore_spark.
    operators.asof.asof_join` — identical semantics, identical zero-
    leakage guarantee, all three strategies available.  Micro-batch
    sizing (maxFilesPerTrigger) bounds the spine side; the feature side
    is whatever ``features`` scans, so at 100 TB pass a bucketed /
    partition-pruned feature snapshot, not the raw log.

    Exactly-once effect on an at-least-once sink: each batch commits
    under its own ``__batch_id`` partition via DYNAMIC partition
    overwrite (the plans/checkpoint.py discipline), so a replayed batch
    rewrites only its own partition instead of duplicating rows.
    Read the result with ``spark.read.parquet(target_dir)`` and drop
    ``__batch_id``.

    Point-in-time note: the static side is re-evaluated per micro-batch
    (stream-static semantics).  For reproducible backfills pass an
    immutable snapshot; for ONLINE enrichment that re-read is the
    feature — newly ingested feature rows become visible to later
    batches, while rows with ``feature ts > spine ts`` are still
    excluded by the as-of itself, so leakage cannot enter through the
    refresh.

    Returns the started StreamingQuery (availableNow trigger —
    processes the backlog then stops; restart with the same
    ``checkpoint_dir`` to resume).
    """
    from featherstore_spark.operators.asof import asof_join

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        out = asof_join(batch_df, features, on=on, ts=ts, strategy=strategy, **asof_kwargs)
        (
            out.withColumn("__batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(target_dir)
        )

    return (
        spine_stream.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_stream_to_table(out_df: DataFrame, target_dir: str, checkpoint_dir: str):
    """availableNow trigger: process the whole backlog then stop — the
    streaming analogue of a batch backfill, restartable from the stream
    checkpoint (exactly-once sink via idempotent file commits)."""
    return (
        out_df.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
