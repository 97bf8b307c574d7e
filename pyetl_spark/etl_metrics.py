"""Inline pipeline quality metrics via DataFrame.observe (ETL-operations
parity: the reference logs per-batch record counts/failures as it lands
files; Spark's observation API collects the same metrics during the normal
action with ZERO extra passes over the data).

At 100 TB an extra metrics pass costs as much as the job — observe()
piggybacks on the action's single scan, and in streaming the same metrics
surface per micro-batch through QueryProgress events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    name: str = "quality",
    not_null_cols: list[str] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count metrics to a frame.

    Returns (instrumented_df, observation); read ``observation.get`` AFTER
    an action has consumed the frame. Metrics: n_rows, null_<col> for each
    requested column.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null_cols or []:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
    return df.observe(obs, *metrics), obs


def assert_quality(
    observation: Observation,
    min_rows: int = 1,
    max_null_fraction: float = 0.0,
) -> dict:
    """Validate observed metrics post-action; raises ValueError on breach.
    Returns the metric dict for logging/landing alongside the output."""
    got = observation.get
    n = got["n_rows"]
    if n < min_rows:
        raise ValueError(f"quality gate: {n} rows < min_rows={min_rows}")
    for key, val in got.items():
        if key.startswith("null_") and n:
            frac = val / n
            if frac > max_null_fraction:
                raise ValueError(
                    f"quality gate: {key} fraction {frac:.4f} > "
                    f"{max_null_fraction}"
                )
    return dict(got)
