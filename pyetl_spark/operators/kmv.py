"""KMV (k-minimum-values / bottom-k theta) distinct sketches with set ops.

A KMV sketch of a set S is the k smallest values of a uniform 64-bit hash
over S (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream"; Beyer et al. SIGMOD'07 for the unbiased estimator; the same
bottom-k structure is DataSketches' theta sketch). It supports:

- distinct-count estimation:  D̂ = (k-1) / u_k  where u_k is the k-th
  minimum normalized to (0,1];
- lossless UNION (merge the value lists, keep the k smallest) — the union
  sketch is EXACTLY the sketch of the union, so unions never compound
  error;
- intersection / Jaccard via the theta trick: the k smallest of A∪B are a
  uniform sample of A∪B, so the fraction of them present in both A and B
  estimates J(A,B), and |A∩B| ≈ J · |A∪B|.

Scale design — why this is not collect_set-and-slice
----------------------------------------------------
The naive per-group ``slice(array_sort(collect_set(hash)), 1, k)`` holds
EVERY distinct hash of a group in one aggregation buffer — unbounded at
100 TB (a group with 10^10 distinct values is a 80 GB buffer). This
implementation computes the *exact* bottom-k with bounded state in two
map-combinable passes:

1. **Threshold pass**: bucket the hash space into k buckets
   (``pmod(h, k)``) and take ``min(h)`` per (group, bucket) — a
   partial/final agg whose state is one long per bucket. Let
   ``tau = max`` over the group's bucket minima. Every bucket's minimum
   is ≤ tau, and the minima are k distinct values, so at least k hashes
   are ≤ tau — hence the true k-th minimum is ≤ tau.
2. **Refine pass**: keep only rows with ``h <= tau`` (expected ~k·e
   survivors per group for uniform hashes — the bucket maxima of minima
   concentrate near k/D · ln k above the k-th order statistic), then the
   tiny survivor set is exact-bottom-k'd with one bounded
   ``slice(array_sort(collect_set), 1, k)``.

Both passes are whole-stage-codegen JVM expressions; the only shuffles
are the two keyed aggregations. The sketch produced is the EXACT bottom-k
(deterministic given the data), not an approximation of it — all
approximation error lives in the estimator, where it belongs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^63 / 2^64 as exact doubles — used to map signed xxhash64 longs onto
#: the unsigned (0,1] grid: u = (h + 2^63 + 1) / 2^64. Signed order equals
#: unsigned-shifted order, so "k smallest signed" IS "k smallest unsigned".
_TWO63 = 9.223372036854775808e18
_TWO64 = 1.8446744073709551616e19


def _hash64(value: Column) -> Column:
    return F.xxhash64(value)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
    hash_fn=None,
) -> DataFrame:
    """Exact bottom-k hash sketch per group: (group_cols..., kmv: array<long>).

    Two bounded passes (see module docstring); the returned array is
    ascending-sorted, length ``min(k, distinct(value_col))``.

    ``hash_fn`` (Column -> Column) defaults to xxhash64 — the scale path.
    Pass ``parity.phash60`` to build a cross-engine-verifiable sketch (a
    DuckDB oracle can replay the identical hash); the bottom-k algebra is
    hash-agnostic, only the estimator's grid changes (see kmv_estimate).
    """
    hashed = df.select(
        *group_cols, (hash_fn or _hash64)(F.col(value_col)).alias("_h")
    )
    # Pass 1: per-(group, bucket) minima -> per-group threshold tau.
    # Guard: tau = max(bucket minima) only bounds the k-th minimum when
    # ALL k buckets are non-empty (then the k minima themselves are ≥k
    # values ≤ tau). An empty bucket implies the group's distinct count
    # is small (D ≳ 4·k·ln k makes every bucket non-empty w.h.p.), so in
    # that branch we disable the threshold — the "unbounded" survivor set
    # is then provably O(k log k) values, still bucket-bounded state.
    tau = (
        hashed.groupBy(*group_cols, F.pmod(F.col("_h"), F.lit(k)).alias("_b"))
        .agg(F.min("_h").alias("_bmin"))
        .groupBy(*group_cols)
        .agg(
            F.when(
                F.count(F.lit(1)) < k, F.lit((1 << 63) - 1)
            )
            .otherwise(F.max("_bmin"))
            .alias("_tau")
        )
    )
    # Pass 2: survivors (h <= tau) are ~k*e rows/group; exact bottom-k.
    # tau is group-cardinality-sized — broadcast it so the filter is
    # map-side and the full hashed fact never shuffles on the group key
    # (which would resurrect group skew the bucketed pass-1 avoided).
    return (
        hashed.join(F.broadcast(tau), on=group_cols)
        .filter(F.col("_h") <= F.col("_tau"))
        .groupBy(*group_cols)
        .agg(
            F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("kmv")
        )
    )


def kmv_estimate(kmv: Column, k: int = 256, grid: float | None = None) -> Column:
    """Unbiased distinct-count estimate from an ascending bottom-k array.

    If the sketch is unsaturated (fewer than k values survive, i.e. the
    set had < k distinct values) the count is EXACT = size(kmv); else
    D̂ = (k-1)/u_k with u_k = kth minimum on the unsigned (0,1] grid.

    ``grid=None`` (default) treats values as signed xxhash64 longs and
    shifts them onto the unsigned 2^64 grid. For a non-negative hash on
    [0, grid) — e.g. ``parity.PHASH60_GRID`` — pass its size and
    u_k = (h_k + 1) / grid.
    """
    n = F.size(kmv)
    if grid is None:
        kth_u = (
            F.element_at(kmv, k).cast("double") + F.lit(_TWO63) + F.lit(1.0)
        ) / F.lit(_TWO64)
    else:
        kth_u = (
            F.element_at(kmv, k).cast("double") + F.lit(1.0)
        ) / F.lit(float(grid))
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / kth_u
    )


def kmv_union(a: Column, b: Column, k: int = 256) -> Column:
    """Sketch of the union: k smallest of the merged value lists.

    Lossless: bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B))
    because any of the union's k smallest hashes is within the k smallest
    of whichever side it came from.
    """
    return F.slice(
        F.array_sort(F.array_distinct(F.concat(a, b))), 1, k
    )


def kmv_jaccard(a: Column, b: Column, k: int = 256) -> Column:
    """Jaccard estimate: fraction of union-sketch values in BOTH sides.

    The union sketch is a uniform size-≤k sample of A∪B; membership of a
    sampled hash in A's (resp. B's) bottom-k decides x∈A exactly for
    hashes below that side's k-th minimum — which every union-sketch
    value is, whenever it belongs to that side. Estimator from Beyer et
    al. '07 / DataSketches theta intersection.
    """
    u = kmv_union(a, b, k)
    both = F.size(F.array_intersect(F.array_intersect(u, a), b))
    return both.cast("double") / F.size(u).cast("double")


def kmv_intersect_estimate(
    a: Column, b: Column, k: int = 256, grid: float | None = None
) -> Column:
    """|A ∩ B| estimate = Jaccard(A,B) · |A ∪ B|-estimate."""
    return kmv_jaccard(a, b, k) * kmv_estimate(kmv_union(a, b, k), k, grid)
