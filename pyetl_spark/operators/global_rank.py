"""Deterministic global ranking without a single-partition window.

Spark has no scale-safe global ``row_number()``: a window over a global
ORDER BY collapses to ONE partition (the classic driver-sized bottleneck).
The standard distributed design is two-phase:

1. ``repartitionByRange`` on the order columns — Spark range-samples the
   key space so partitions are balanced AND globally ordered
   partition-to-partition;
2. PIN the shuffle (localCheckpoint): range bounds come from a SAMPLE, so
   two independent executions of the same plan may place rows differently
   — the counts collected in step 4 must describe the SAME physical
   partitioning the final job reads;
3. rank WITHIN each partition (cheap local sort, no exchange beyond the
   range shuffle);
4. add the partition's global offset = exclusive prefix sum of partition
   counts — counts are collected to the driver (ONE long per partition,
   k-sized like the IVF centroid collects), broadcast back as a map.

Total cost: one pinned range shuffle + one count pass over the
materialized blocks — at 100 TB this is the same plan shape a sort would
use; state on the driver is O(partitions).

Two entry points:
- ``global_order_rank`` — rank by caller-supplied order columns (the
  distributed ORDER BY primitive; sorted-neighborhood dedup builds on it);
- ``global_shuffle_rank`` — rank by a seeded md5 key: the training-data
  "shuffle the corpus reproducibly" primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shuffle_key(id_col, seed: int = 42):
    """Deterministic per-row sort key: md5 over seed + id. Collision-free
    ordering because the id disambiguates equal hashes downstream."""
    return F.md5(F.concat_ws("|", F.lit(str(seed)), id_col.cast("string")))


def global_order_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """(input columns…, ``out_col`` long) — dense global 0-based rank in
    ``order_cols`` order, computed with the two-phase plan above (never a
    global single-partition window)."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *order_cols)
    with_pid = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = with_pid.withColumn("_lrank", F.row_number().over(w) - 1)

    counts = {
        r["_pid"]: r["n"]
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        ),
        F.col("_pid"),
    )
    return (
        local.withColumn(
            out_col, (offset_expr + F.col("_lrank")).cast("long")
        )
        .drop("_pid", "_lrank")
    )


def ntile_from_rank(rank, n: int, k: int):
    """SQL ``ntile(k)`` as a pure expression over a 0-based global rank.

    The ANSI definition (identical in Spark and DuckDB): with n rows and
    k buckets, the first ``n mod k`` buckets hold ``n div k + 1`` rows,
    the rest ``n div k``. Combined with ``global_order_rank`` this gives
    the exact global ntile WITHOUT a single-partition window — ``n`` is
    one driver long (a count), the mapping is a stateless projection.

    Division is on doubles but exact: ranks are < 2^53 and positive, so
    ``floor(rank / big)`` equals integer division.
    """
    q, rem = divmod(int(n), int(k))
    big = q + 1
    if q == 0:  # fewer rows than buckets: bucket = rank + 1
        return (rank + 1).cast("int")
    head = rem * big  # rows living in the "big" buckets
    return (
        F.when(rank < head, F.floor(rank / F.lit(float(big))) + 1)
        .otherwise(rem + F.floor((rank - head) / F.lit(float(q))) + 1)
        .cast("int")
    )


def global_order_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_cols: list[str],
    prefix: str = "cum_",
    num_partitions: int | None = None,
) -> DataFrame:
    """(input columns…, ``prefix``<v> long per value col) — INCLUSIVE
    running totals in global ``order_cols`` order: the distributed ECDF /
    prefix-sum primitive, same two-phase plan as ``global_order_rank``
    (range shuffle pinned by localCheckpoint, per-partition window, driver
    offsets = one long per partition per column — never a single-partition
    window).

    ``order_cols`` must uniquely key the rows (aggregate to distinct keys
    first) — ties would make the row-level running sum order-ambiguous.
    ``value_cols`` must be integer-typed: partial sums are exact longs, so
    the assembled prefix sums are exact at any partitioning.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *order_cols)
    with_pid = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = with_pid
    for v in value_cols:
        local = local.withColumn(f"_l_{v}", F.sum(v).over(w).cast("long"))

    totals = {
        r["_pid"]: [r[f"_t_{v}"] for v in value_cols]
        for r in with_pid.groupBy("_pid")
        .agg(*[F.sum(v).cast("long").alias(f"_t_{v}") for v in value_cols])
        .collect()
    }
    offsets: dict[int, list[int]] = {}
    acc = [0] * len(value_cols)
    for pid in sorted(totals):
        offsets[pid] = list(acc)
        acc = [a + (t or 0) for a, t in zip(acc, totals[pid])]
    out = local
    for i, v in enumerate(value_cols):
        off = F.element_at(
            F.create_map(
                *[
                    F.lit(x)
                    for pid, offs in sorted(offsets.items())
                    for x in (pid, offs[i])
                ]
            ),
            F.col("_pid"),
        )
        out = out.withColumn(prefix + v, (off + F.col(f"_l_{v}")).cast("long"))
    return out.drop("_pid", *[f"_l_{v}" for v in value_cols])


def global_shuffle_rank(
    df: DataFrame,
    id_col: str,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """(input columns…, shuffle_rank long) — dense global 0-based rank in
    deterministic shuffled order. Same seed → same permutation, any
    cluster size or partitioning (asserted in tests)."""
    keyed = df.withColumn("_sk", shuffle_key(F.col(id_col), seed))
    return global_order_rank(
        keyed, ["_sk", id_col], out_col="shuffle_rank",
        num_partitions=num_partitions,
    ).drop("_sk")
