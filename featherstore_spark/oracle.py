"""Trivially-correct pandas reference materializer (tests only).

Mirrors the reference's retrieval semantics with the C1/C2 fixes applied:
latest = max(ts) then max(tiebreak); as-of = merge_asof backward inclusive.
Small-scale only — used to differentially test every Spark strategy
(SURVEY.md §5.2 item 1).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd


def latest_per_entity_pd(
    df: pd.DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    tiebreaks: Sequence[str] = ("turn_idx",),
) -> pd.DataFrame:
    s = df.sort_values([entity_col, ts_col, *tiebreaks], kind="mergesort")
    return s.groupby(entity_col, as_index=False).tail(1).reset_index(drop=True)


def asof_join_pd(
    spine: pd.DataFrame,
    features: pd.DataFrame,
    on: str = "conv_id",
    ts: str = "ts",
    tiebreaks: Sequence[str] = (),
    prefix: str = "f_",
) -> pd.DataFrame:
    """Per-entity merge_asof, backward, inclusive, (ts, tiebreaks) order."""
    val_cols = [c for c in features.columns if c not in (on, ts)]
    out_rows = []
    feats_by_entity = dict(tuple(features.groupby(on)))
    for _, srow in spine.iterrows():
        f = feats_by_entity.get(srow[on])
        match = None
        if f is not None:
            elig = f[f[ts] <= srow[ts]]
            if len(elig):
                elig = elig.sort_values([ts, *tiebreaks], kind="mergesort", na_position="first")
                match = elig.iloc[-1]
        row = dict(srow)
        row[prefix + ts] = match[ts] if match is not None else pd.NaT
        for c in val_cols:
            row[prefix + c] = match[c] if match is not None else None
        out_rows.append(row)
    return pd.DataFrame(out_rows)


def sessionize_pd(
    df: pd.DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    gap_s: float = 30 * 60,
) -> pd.DataFrame:
    s = df.sort_values([entity_col, order_col], kind="mergesort").copy()
    gaps = s.groupby(entity_col)[ts_col].diff().dt.total_seconds()
    s["session_id"] = (gaps > gap_s).fillna(False).astype(int).groupby(s[entity_col]).cumsum()
    return s
