"""SimHash — 64-bit similarity fingerprints for near-dup detection
(north-star dedup family).

Charikar's scheme: each token votes ±1 on each of 64 bit positions
(direction = the token's hash bits); the document's simhash is the sign
vector. Hamming-close simhashes ⇒ similar token multisets. Detection cost
is linear: band the 64 bits into 4×16-bit keys (pigeonhole: hamming <= 3
⇒ at least one identical band) and self-join per band.

Implementation is pure DataFrame algebra over xxhash64 — per doc one
higher-order fold builds the 64 bit-sums JVM-side; no explode of
(doc × token × bit) rows, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 64


def simhash(tokens_col: Column) -> Column:
    """Column: bigint simhash of a token array.

    For bit j: sum over tokens of (hash_bit_j ? +1 : -1); simhash bit j =
    (sum > 0). The fold builds an array of 64 sums in one pass, then
    reassembles the sign bits into a single bigint.
    """
    hashes = F.transform(tokens_col, lambda t: F.xxhash64(t))
    # bit masks as Python literals (shift counts can't be Columns); the
    # sign bit's mask is expressed as its negative two's-complement value
    masks = [
        (1 << j) if j < 63 else -(1 << 63) for j in range(_BITS)
    ]

    def vote_array(h):
        # per-token ±1 votes for all 64 bits — built by a Python loop, so
        # each element is a plain bitwiseAND against a literal mask
        return F.array(
            *[
                F.when(h.bitwiseAND(F.lit(m)) != 0, 1)
                .otherwise(-1)
                .cast("long")
                for m in masks
            ]
        )

    # votes[j] = sum over tokens of ±1 for bit j (one fold, JVM-side)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), _BITS),
        lambda acc, h: F.zip_with(acc, vote_array(h), lambda a, v: a + v),
    )
    out = F.lit(0).cast("long")
    for j, m in enumerate(masks):
        out = out.bitwiseOR(
            F.when(F.element_at(votes, j + 1) > 0, F.lit(m))
            .otherwise(0)
            .cast("long")
        )
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints: popcount(a XOR b)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via 16-bit-band
    blocking (guaranteed complete for max_hamming <= 3 by pigeonhole).

    One narrow simhash pass, one explode to 4 band rows/doc, one shuffle on
    (band_idx, band_value), in-bucket join + exact hamming verify.
    """
    sh = docs.select(
        F.col(id_col).alias("_id"), simhash(F.col(tokens_col)).alias("_sh")
    )
    bands = sh.select(
        "_id",
        "_sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("_sh"), 16 * i).bitwiseAND(0xFFFF)
                    for i in range(4)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    left = bands.select(
        F.col("band_idx").alias("bi"),
        F.col("band_val").alias("bv"),
        F.col("_id").alias("id_a"),
        F.col("_sh").alias("sh_a"),
    )
    right = bands.select(
        F.col("band_idx").alias("bi2"),
        F.col("band_val").alias("bv2"),
        F.col("_id").alias("id_b"),
        F.col("_sh").alias("sh_b"),
    )
    return (
        left.join(
            right,
            (F.col("bi") == F.col("bi2"))
            & (F.col("bv") == F.col("bv2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select(
            "id_a",
            "id_b",
            hamming64(F.col("sh_a"), F.col("sh_b")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
