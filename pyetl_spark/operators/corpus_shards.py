"""Shard-balanced shuffled corpus export — the write side of the
"shuffle globally, then shard" training-data contract
(`text_shard_assign` is the declared assignment query).

Why not `df.repartition(n).write`: repartition hashes rows to tasks, so
shard sizes fluctuate with hash luck and the within-shard order is
whatever the shuffle delivered — not reproducible. Here the seeded
global permutation (operators/global_rank.py — pinned range shuffle,
driver state O(partitions)) gives every doc a dense rank; round-robin on
that rank makes shard sizes equal ±1 BY CONSTRUCTION and `shard_pos`
defines the exact read order inside each shard. Same seed → byte-equal
shard layout on any cluster size.

At 100 TB: one range shuffle for the rank, one hash exchange on `shard`
for the partitioned write (each output task writes one shard directory),
no skew (shards are equal by construction). Readers prune to their shard
via partition pruning and sort by `shard_pos` (within-shard sort, no
global order needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyetl_spark.operators.global_rank import global_shuffle_rank


def assign_shards(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 42,
) -> DataFrame:
    """(input columns…, shard long, shard_pos long) — deterministic
    balanced shard layout from the seeded global shuffle rank."""
    ranked = global_shuffle_rank(docs, id_col, seed=seed)
    return ranked.select(
        *docs.columns,
        (F.col("shuffle_rank") % n_shards).cast("long").alias("shard"),
        F.expr(f"shuffle_rank div {n_shards}").cast("long").alias("shard_pos"),
    )


def write_corpus_shards(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 42,
) -> None:
    """Write the shuffled corpus as `shard=<i>/` parquet partitions.

    One file per shard (each shard is one write task after the exchange
    on `shard`) keeps the shard:file mapping 1:1 for sequential readers;
    rows are sorted by shard_pos within each file so a plain scan reads
    the permutation order back without re-sorting.
    """
    (
        assign_shards(docs, id_col, n_shards, seed)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
