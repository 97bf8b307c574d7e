"""Exponentially weighted moving average per key — the recursive
smoother y_t = α·x_t + (1−α)·y_{t−1} that no SQL window frame can
express (each output depends on the UNBOUNDED past through a recurrence,
not a frame aggregate; SQL's MODEL/recursive tricks don't vectorize).

Spark-first shape: ``applyInPandas`` — one shuffle on the key, each
group sorted by (ts, tiebreak) inside its task, pandas' C-implemented
``ewm(...).mean()`` doing the recurrence vectorized. Deterministic: the
recurrence is a fixed left-to-right op order once the sort is total.

Scale: per-key groups materialize in task memory (the applyInPandas
contract). Uniform user keys at 100 TB are fine (events/user ≪ task
memory); a mega-key (one sensor with 10⁹ rows) needs the chunked
carry-state variant: window the key by time-slice, EWMA each slice, and
chain slice-end states y_end·(1−α)^gap into the next slice — same math,
bounded memory. The streaming twin is applyInPandasWithState keeping
(last_y, last_ts) per key (see streaming/stateful_anomaly_counter for
the state plumbing pattern).
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401  (mirrors sibling operators)

import pandas as pd
from pyspark.sql import DataFrame


def _ship_module_by_value() -> None:
    """Ship this module inside task closures (see multimodal.py)."""
    from pyspark import cloudpickle

    import pyetl_spark.operators.ewma as _self

    cloudpickle.register_pickle_by_value(_self)


def ewma(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    tiebreak: str | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """DataFrame(key, ts, tiebreak?, value, ewma) — per-key EWMA in
    event-time order. ``adjust=False`` pandas semantics: the plain
    recurrence with y_0 = x_0."""
    _ship_module_by_value()
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    cols = [key, *order, value_col]

    # The recurrence is an EXPLICIT loop, not pandas' ewm C kernel:
    # y_t = om·y_{t-1} + a·x_t with the two products formed before the
    # add, so every step is the same fixed IEEE op sequence a SQL oracle
    # can replay (win_ewma's DuckDB recursive CTE computes literally
    # `om * y + a * x`). pandas ewm(adjust=False) is the same math but
    # an unspecified internal op order — equal only to ~1e-16, which a
    # value hash cannot tolerate. Cost: pure-Python steps over ≤ a few
    # hundred rows per key (the applyInPandas group), negligible next to
    # the shuffle.
    a = float(alpha)
    om = 1.0 - a

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        xs = pdf[value_col].to_numpy(dtype="float64")
        ys = []
        y = 0.0
        for i, x in enumerate(xs):
            y = float(x) if i == 0 else om * y + a * float(x)
            ys.append(y)
        pdf[out_col] = ys
        return pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*cols).schema.fields
    ) + f", {out_col} double"
    return (
        df.select(*cols)
        .groupBy(key)
        .applyInPandas(fit, schema=schema)
    )
