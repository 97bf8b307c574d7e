"""Deterministic global shuffle rank — the training-data "shuffle the
corpus" primitive (north star: training pipelines shuffle examples
globally, reproducibly, before packing/sharding).

Spark has no scale-safe global ``row_number()``: a window over a global
ORDER BY collapses to ONE partition (the classic driver-sized bottleneck).
The standard distributed design is two-phase:

1. key every row with a deterministic pseudo-random sort key
   (``md5(seed || id)`` — replayable, no rand());
2. ``repartitionByRange`` on that key — Spark range-samples the key space
   so partitions are balanced AND globally ordered partition-to-partition;
3. rank WITHIN each partition (cheap local sort, no exchange beyond the
   range shuffle);
4. add the partition's global offset = exclusive prefix sum of partition
   counts — counts are collected to the driver (ONE long per partition,
   k-sized like the IVF centroid collects), broadcast back as a map.

Total cost: one range shuffle + one count pass — at 100 TB this is the
same plan shape a sort would use; state on the driver is O(partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shuffle_key(id_col, seed: int = 42):
    """Deterministic per-row sort key: md5 over seed + id. Collision-free
    ordering because the id disambiguates equal hashes downstream."""
    return F.md5(F.concat_ws("|", F.lit(str(seed)), id_col.cast("string")))


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
    parts = num_partitions or keyed.sparkSession.sparkContext.defaultParallelism
    ranged = keyed.repartitionByRange(parts, "_sk", id_col)

    # PIN the range shuffle before anything reads it. repartitionByRange
    # derives its bounds from a SAMPLE, so two independent executions of the
    # same plan may assign rows to different partitions — the counts
    # collected below would then disagree with the partition ids the final
    # job sees (duplicate/gapped ranks, or NULL offsets). localCheckpoint
    # materializes the shuffled blocks once; both the counts action and the
    # returned DataFrame read the same physical partitioning. Also saves a
    # full recompute of the upstream lineage (counts + final = 1 shuffle,
    # not 2).
    with_pid = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_pid").orderBy("_sk", id_col)
    local = with_pid.withColumn("_lrank", F.row_number().over(w) - 1)

    # exclusive prefix sum of partition sizes — one long per partition to
    # the driver (bounded by partition count, not data size)
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
            "shuffle_rank", (offset_expr + F.col("_lrank")).cast("long")
        )
        .drop("_sk", "_pid", "_lrank")
    )
