"""Layout strategies for shuffle minimization (SURVEY.md §4; north-star
"minimize shuffles" directive).

Three tools, in order of preference at 100 TB:

1. **Bucketing** (`write_bucketed` + `bucketed_join`): pay the shuffle ONCE
   at write time; every subsequent equi-join/aggregation on the bucket key
   reads co-located buckets and plans a SortMergeJoin with NO Exchange.
   The right layout for fact tables joined repeatedly on the same key
   (orders ⋈ lineitem on orderkey).
2. **Co-partitioning** (`colocate_join`): one explicit repartition on the
   join key for both sides — the exchange happens, but exactly once each,
   and the partitioning is reusable by downstream same-key operations in
   the same job.
3. **Salting** (`salted_join`): for skewed keys AQE can't split well —
   deterministic salt (hash-derived, never rand()) fans each hot left key
   across N sub-partitions and replicates the matching right rows N ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (+sorted) managed table. The one-time shuffle
    this write pays is the shuffle every future join on `key` skips."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Spark plans SortMergeJoin over the bucket layout — zero
    Exchange nodes (asserted in tests/test_layout.py)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    (key,) = set(left.columns) & set(right.columns) or [None]
    if key is None:
        raise ValueError("tables share no column to join on")
    return left.join(right, key, how)


def colocate_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    partitions: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Explicitly co-partition both sides on the join key before joining.
    Downstream groupBy on the same key reuses the partitioning (no second
    exchange)."""
    lp = left.repartition(partitions, F.col(left_key))
    rp = right.repartition(partitions, F.col(right_key))
    return lp.join(rp, lp[left_key] == rp[right_key], how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: deterministic salt splits hot keys.

    Left rows get salt = xxhash64(whole row) mod N (derived, replayable —
    rand() is banned); right rows replicate across all N salts via one
    posexplode. Result equals the plain join exactly (tests assert)."""
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)
    ).cast("int")
    lsalted = left.withColumn("_salt", salt)
    # generators can't nest inside other expressions — explode bare
    rsalted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = lsalted.join(
        rsalted,
        (lsalted[key] == rsalted[key]) & (lsalted["_salt"] == rsalted["_salt"]),
        how,
    )
    keep = [lsalted[c] for c in left.columns] + [
        rsalted[c] for c in right.columns if c != key
    ]
    return out.select(*keep)


def compact(
    spark,
    path: str,
    target_files: int,
    partition_col: str | None = None,
) -> None:
    """Small-files compaction: rewrite a directory (optionally keeping its
    Hive partition layout) into ~target_files files.

    The small-files problem is the classic failure mode of long-running
    partitioned sinks (the reference lands a file per flush); NameNode/
    listing pressure and per-file open costs dominate reads at scale.
    Rewrite via coalesce (no shuffle) when reducing, repartition otherwise.
    """
    df = spark.read.parquet(path)
    current = df.rdd.getNumPartitions()
    out = (
        df.coalesce(target_files)
        if target_files < current
        else df.repartition(target_files)
    )
    tmp = path.rstrip("/") + "__compact_tmp"
    writer = out.write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(tmp)
    # atomic-ish swap (same-filesystem rename), mirroring the reference's
    # temp-name-then-move landing protocol
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)


def zvalue(cols: list[str], bits: int = 16):
    """Morton (Z-order) curve value interleaving the low ``bits`` of each
    integer column — column j contributes its bit i at output position
    i*len(cols)+j, so nearby (x, y, …) tuples get nearby z-values.

    Pure JVM expression (shifts + masks — whole-stage-codegen'd, no UDF).
    Precondition: columns are non-negative ints < 2**bits; normalize/
    quantize upstream (e.g. epoch-day, bucketed price).
    """
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        col = F.col(c).cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(col, i).bitwiseAND(F.lit(1)),
                    i * n + j,
                )
            )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def zorder_repartition(
    df: DataFrame, cols: list[str], num_partitions: int, bits: int = 16
) -> DataFrame:
    """Range-partition + sort the frame along the Z-order curve of
    ``cols`` — the multi-dimensional clustering layout: every partition
    (→ parquet file) covers a compact hyper-rectangle, so min/max file
    stats prune scans for predicates on ANY of the interleaved columns,
    not just the leading sort key. A plain sort by x gives perfect
    pruning on x and NONE on y; Z-order gives √-grade pruning on both
    (tests quantify this). Write the result with maxRecordsPerFile to
    make partition↔file 1:1; the same z column is the right bucket/sort
    key for lakehouse OPTIMIZE-style compaction."""
    z = zvalue(cols, bits).alias("_z")
    return (
        df.withColumn("_z", z)
        .repartitionByRange(num_partitions, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
