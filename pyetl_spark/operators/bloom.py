"""Bloom-filter semi-join prefilter — the 100 TB fact-reduction kernel.

Problem shape: a fact⋈dim join where the dim side is too big to broadcast
as ROWS (tens of millions of keys ⇒ GBs hashed) but the join is selective —
most fact rows match no dim key. A plain sort-merge join shuffles the whole
fact table first and discards the misses after; at 100 TB that discarded
shuffle is the dominant cost. The classic fix is to broadcast a *bit-set
fingerprint* of the dim keys instead: a Bloom filter of m bits costs
m/8 bytes regardless of key width (8 bits/key ≈ 2.4% fp at k=4 — the
measured sweet spot: doubling to 16 bits/key halves nothing that matters
but doubles the word table, whose size drives build-collect, plan-ship
and codegen cost; 10^9 keys ≈ 1 GB of bits, still shippable where the
dim's rows are TBs), the
fact side drops non-members *before* the exchange, and the exact join
afterwards removes the false positives — the final result is bit-identical
to the plain join, which is why `join_bloom_prefilter` can be Tier-A
hash-matched against the plain-join oracle.

Sizing is AUTOMATIC by default: m scales with the measured key count at
a fixed bits-per-key budget, so the false-positive rate stays flat as the
dim grows — a hard-coded m silently degrades to a pass-through filter at
10× the design size (measured: fp 1.3% → 82% for a fixed 2^15 bits from
sf0.1 → sf1). The count() to size it is one cheap aggregate on the
key set the build scans anyway.

Spark 4 grows an internal runtime bloom rewrite
(`spark.sql.optimizer.runtime.bloomFilter.enabled`, InjectRuntimeFilter),
but it only fires under its own selectivity/size heuristics and cannot be
directed. This operator is the explicit, deterministic version: build the
bits with DataFrame algebra (k seeded xxhash64 positions per key, map-side
combinable `bit_or` into m/32 32-bit words), collect the BOUNDED word
table (m/32 longs — the same bounded-collect contract as ivf.py's
centroids), and test membership with pure JVM bitwise expressions so the
prefilter rides inside WholeStageCodegen on the scan.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 4
DEFAULT_BITS_PER_KEY = 8
_MIN_BITS = 1 << 10

# Words are 32-bit (stored in longs): the per-bit mask is pow(2.0, bit),
# exact as a double for bit ≤ 31 and cast back to long — the Python DSL's
# shiftleft() only takes a literal shift amount, so a column-indexed shift
# has to come from arithmetic that both engines and codegen keep exact.
_WORD_BITS = 32


@dataclass(frozen=True)
class BloomFilter:
    """The built filter: the word table plus the parameters that hashed
    it — membership tests MUST use the same (m, k) the build used."""

    words: list[int]
    num_bits: int
    num_hashes: int

    def fill_ratio(self) -> float:
        """Fraction of set bits — sanity metric (0.5 ⇒ fp ≈ 2^-k)."""
        return sum(bin(w).count("1") for w in self.words) / (
            _WORD_BITS * len(self.words)
        )


#: Hard cap on m (EXCLUSIVE): word indices are cast to 32-bit ints for
#: element_at, whose 1-based index is word_idx + 1 — so m/32 + 1 must stay
#: <= 2^31 - 1, i.e. m strictly below 2^36 (8 GiB of bits) — positions
#: themselves stay BIGINT so no bit position ever overflows.
MAX_NUM_BITS = 1 << 36


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k bit positions of one key: pmod(xxhash64(seed_i, key), m).
    Kept as BIGINT — an int32 cast would wrap for m >= 2^31 and silently
    corrupt words (false NEGATIVES, the one failure this filter must
    never have)."""
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def _word_idx(pos: Column) -> Column:
    # int32 is safe here: word count = m/32 < 2^31 enforced by MAX_NUM_BITS
    return F.floor(pos / F.lit(_WORD_BITS)).cast("int")


def _bit_mask(pos: Column) -> Column:
    return F.pow(F.lit(2.0), pos % F.lit(_WORD_BITS)).cast("long")


def bloom_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int | None = None,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
) -> BloomFilter:
    """Build the filter over ``keys[key_col]``.

    ``num_bits=None`` (default) sizes m to the next power of two holding
    ``bits_per_key`` bits per measured key — fp stays flat as the key set
    grows. Fully distributed until the last step: each key explodes to k
    (word_idx, bit_mask) pairs, `bit_or` partial-aggregates map-side, and
    the one shuffle is bounded by m/32 distinct words — independent of
    key count. The collect is the bounded word table, never the keys.
    """
    sized_here = num_bits is None
    if sized_here:
        # the count AND the bit-build both scan keys — pin it so the
        # caller's upstream lineage (joins, distincts) runs once
        keys = keys.persist()
        n = keys.count()
        num_bits = max(_MIN_BITS, 1 << math.ceil(math.log2(max(1, n) * bits_per_key)))
    if num_bits >= MAX_NUM_BITS:
        # EXCLUSIVE cap: at m == 2^36 exactly, element_at's 1-based index
        # `_word_idx(pos) + 1` hits 2^31 in int32 arithmetic and wraps
        # negative for the last word — a false-negative hazard, the one
        # failure a Bloom filter must never have.
        raise ValueError(
            f"num_bits {num_bits} must be < MAX_NUM_BITS {MAX_NUM_BITS}"
        )
    if num_bits % _WORD_BITS:
        raise ValueError(f"num_bits must be a multiple of {_WORD_BITS}")
    pairs = [
        F.struct(_word_idx(pos).alias("w"), _bit_mask(pos).alias("m"))
        for pos in _positions(F.col(key_col), num_bits, num_hashes)
    ]
    words = (
        keys.select(F.explode(F.array(*pairs)).alias("p"))
        .groupBy(F.col("p.w").alias("w"))
        .agg(F.bit_or("p.m").alias("bits"))
        .collect()
    )
    if sized_here:
        keys.unpersist()
    arr = [0] * (num_bits // _WORD_BITS)
    for row in words:
        arr[row["w"]] = row["bits"]
    return BloomFilter(arr, num_bits, num_hashes)


def bloom_might_contain(key: Column, bf: BloomFilter) -> Column:
    """Membership predicate: true for every inserted key (no false
    negatives), true for a non-member with probability ≈ (1-e^{-kn/m})^k.

    Pure JVM expression (element_at + bitwiseAND over an array<long>
    literal), so Catalyst keeps it inside the scan's codegen stage and the
    words array ships once per task with the serialized plan. The literal
    goes through numpy: ``lit(list)`` builds a CreateArray of N element
    literals (re-materialized per evaluation — measured 2.5× slower at
    8k words), while ``lit(ndarray)`` lands as ONE constant ArrayData.
    """
    arr = F.lit(np.asarray(bf.words, dtype="int64"))
    cond: Column | None = None
    for pos in _positions(key, bf.num_bits, bf.num_hashes):
        word = F.element_at(arr, _word_idx(pos) + F.lit(1))
        hit = word.bitwiseAND(_bit_mask(pos)) != F.lit(0)
        cond = hit if cond is None else cond & hit
    assert cond is not None
    return cond


def bloom_fill_ratio(bf: BloomFilter) -> float:
    """Back-compat alias for ``bf.fill_ratio()``."""
    return bf.fill_ratio()
