"""Table profiler — the ETL reconnaissance step: per-column null
counts, distinct cardinalities, and min/max, emitted as one long-format
DataFrame(column, n_nulls, n_distinct, min_num, max_num, min_str,
max_str).

Plan shape: ONE full-scan aggregation computing every column's stats as
parallel aggregate expressions (count/countDistinct/min/max are all
partial-aggregable, so the scan streams once and the shuffle carries a
single stats row), then a tiny explode into long format — NOT one scan
per column, which is the naive profiler's 10× read amplification.

Type discipline for cross-engine hashing: numeric min/max land in
DOUBLE columns (dates via epoch-day ints), string min/max in VARCHAR
columns (byte-order comparisons — safe for ASCII domains; collation-
sensitive corpora should compare on a normalized key). Exact counts
everywhere."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    numeric_cols: list[str] = (),
    date_cols: list[str] = (),
    string_cols: list[str] = (),
) -> DataFrame:
    """Profile the given columns of ``df`` in one aggregation pass."""
    aggs = []
    all_cols = [*numeric_cols, *date_cols, *string_cols]
    for c in all_cols:
        aggs.append(
            (F.count(F.lit(1)) - F.count(c)).alias(f"__nulls_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
    for c in date_cols:
        d0 = F.lit("1970-01-01").cast("date")
        aggs.append(
            F.min(F.datediff(F.col(c).cast("date"), d0))
            .cast("double")
            .alias(f"__min_{c}")
        )
        aggs.append(
            F.max(F.datediff(F.col(c).cast("date"), d0))
            .cast("double")
            .alias(f"__max_{c}")
        )
    for c in string_cols:
        aggs.append(F.min(c).alias(f"__smin_{c}"))
        aggs.append(F.max(c).alias(f"__smax_{c}"))
    stats = df.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"__nulls_{c}").alias("n_nulls"),
                    F.col(f"__nd_{c}").alias("n_distinct"),
                    (
                        F.col(f"__min_{c}")
                        if c not in string_cols
                        else F.lit(None).cast("double")
                    ).alias("min_num"),
                    (
                        F.col(f"__max_{c}")
                        if c not in string_cols
                        else F.lit(None).cast("double")
                    ).alias("max_num"),
                    (
                        F.col(f"__smin_{c}")
                        if c in string_cols
                        else F.lit(None).cast("string")
                    ).alias("min_str"),
                    (
                        F.col(f"__smax_{c}")
                        if c in string_cols
                        else F.lit(None).cast("string")
                    ).alias("max_str"),
                )
                for c in all_cols
            ]
        )
    )
    return stats.select(rows.alias("r")).select("r.*")
