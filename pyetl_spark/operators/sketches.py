"""Count-min sketch built as DataFrame algebra (frequency estimation).

The sketch is a (depth × width) counter table. Spark-first construction:
each token row explodes into `depth` (seed, bucket) cells via xxhash64
(JVM-side, whole-stage codegen), then ONE partial/final aggregate on
(seed, bucket) produces the sketch — a DataFrame of at most depth·width
rows, regardless of corpus size. That bounded size is the whole point:
the shuffle carries ≤ depth·width counters per map task (map-side
combine), and the finished sketch broadcasts anywhere.

Point queries re-hash the probe terms with the same seeds and take the
min across depth rows — the classic CMS overestimate-only guarantee:
  est ≥ true,  P[est > true + ε·N] ≤ δ  with width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.
Quality is engine-tested in tests/test_approx_operators.py against exact
counts. The default hash family is xxhash64 (JVM-fast, Spark-only); pass
``seeded_hash=parity.phash60_seeded`` to build a sketch a DuckDB oracle
can replay bit-for-bit (how `text_count_min_freq` earns Tier A).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seeds(depth: int):
    return F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("seed")


def _default_seeded_hash(seed_col, token_col):
    return F.xxhash64(seed_col, token_col)


def _bucket(token_col, width: int, seeded_hash=None):
    h = (seeded_hash or _default_seeded_hash)(F.col("seed"), token_col)
    return F.pmod(h, F.lit(width)).alias("bucket")


def cms_build(
    tokens: DataFrame,
    token_col: str = "token",
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 4096,
    seeded_hash=None,
) -> DataFrame:
    """Aggregate a token stream into a count-min sketch.

    Returns DataFrame(seed int, bucket bigint, cnt bigint) with at most
    depth·width rows. ``weight_col`` (optional) makes it a weighted CMS
    (e.g., pre-aggregated term counts) — exact because integer sums.
    """
    cells = tokens.select(
        F.col(token_col).alias("_tok"),
        *( [F.col(weight_col).alias("_w")] if weight_col else [] ),
        _seeds(depth),
    ).select("seed", _bucket(F.col("_tok"), width, seeded_hash),
             *( [F.col("_w")] if weight_col else [] ))
    agg = F.sum("_w") if weight_col else F.count(F.lit(1))
    return cells.groupBy("seed", "bucket").agg(agg.cast("long").alias("cnt"))


def cms_estimate(
    probes: DataFrame,
    sketch: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 4096,
    seeded_hash=None,
) -> DataFrame:
    """Point-query the sketch for each probe term.

    Probe terms are re-hashed with the same (depth, width), joined to the
    sketch on (seed, bucket) — the sketch side is tiny, so this is a
    broadcast join — and min-reduced across seeds. Missing cells count 0
    (term never hashed there). Output: (token, est_count).
    """
    probed = probes.select(
        F.col(token_col).alias("token"), _seeds(depth)
    ).select("token", "seed", _bucket(F.col("token"), width, seeded_hash))
    joined = probed.join(F.broadcast(sketch), ["seed", "bucket"], "left")
    return (
        joined.withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .groupBy("token")
        .agg(F.min("cnt").alias("est_count"))
    )
