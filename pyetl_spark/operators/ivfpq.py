"""IVF-PQ — the composed billion-scale ANN index (r12).

operators/ivf.py gives coarse cells (prune the corpus to nprobe cells
per probe); operators/pq.py gives 32x-compressed codes + asymmetric
distance. IVF-PQ is their standard composition (the FAISS IVFPQ
layout): PQ is trained on RESIDUALS (vector minus its coarse
centroid) — residuals are centered near zero so the same k codewords
quantize them far better than raw vectors — and search computes, per
(probe, probed cell), the probe's OWN residual against that cell's
centroid before the ADC table lookup.

Scale shape: index build = one coarse assign (broadcast centroids) +
one residual zip_with + one PQ fit/encode over the exploded subvector
frame — all corpus-linear, no pairwise work. Search = nprobe cells per
probe (broadcast coarse centroids), an m x k ADC table per (probe,
cell) — tiny per probe, but the union scales with the probe batch, so
it is shuffle-joined and AQE broadcasts only when small — ONE equi-join
on (cell, sub, code), and a fixed-order fold per candidate. Memory: the inverted file holds
m log2(k)-bit codes per vector (8 bytes at m=8, k=16) — the arithmetic
that fits billions of vectors on a cluster.

Determinism: residual subtraction is exact IEEE on identical inputs
(coarse centroids are integer-quantized by kmeans_fit_exact, PQ means
by pq_fit_exact), and the ADC sum folds in fixed sub order — so the
whole build + search pipeline is DuckDB-replayable (the Tier-A oracle
in queries/llm_scale._ivfpq_oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyetl_spark.operators.pq import _sq_dist


def ivfpq_residuals(
    assigned: DataFrame,
    coarse_centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "e",
) -> DataFrame:
    """(id_col, cell, r): each vector minus its coarse centroid.

    ``assigned`` is ivf.ivf_assign output (id, vec, cell);
    ``coarse_centroids`` is (cell, centroid). Broadcast join — the
    centroid table is k rows."""
    return (
        assigned.join(F.broadcast(coarse_centroids), "cell")
        .select(
            id_col,
            "cell",
            F.zip_with(
                F.col(vec_col), F.col("centroid"), lambda x, y: x - y
            ).alias("r"),
        )
    )


def _split_keyed(
    df: DataFrame, keys: list[str], vec_col: str, m: int, dim: int
) -> DataFrame:
    """(keys..., sub, v): subvector explode keeping arbitrary key cols
    (pq.split_subvectors keeps a single id — search needs (probe, cell))."""
    d_sub = dim // m
    # same guard as pq.split_subvectors: a non-divisible (m, dim) would
    # silently drop the trailing dim % m components from every probe
    # residual (wrong rankings, no error) while the corpus-side split
    # fails fast — build and search must agree on the failure mode
    assert d_sub * m == dim, "m must divide dim"
    subs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("sub"),
                    F.slice(F.col(vec_col), j * d_sub + 1, d_sub).alias("v"),
                )
                for j in range(m)
            ]
        )
    )
    return df.select(*keys, subs.alias("s")).select(
        *keys, F.col("s.sub").alias("sub"), F.col("s.v").alias("v")
    )


def ivfpq_topk(
    probes: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    coarse_centroids: DataFrame,
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    m: int = 8,
    dim: int = 64,
    topk: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-PQ search: (probe_id, id, adc_dist, rank).

    ``codes`` = PQ codes of the RESIDUAL corpus, long format WITH the
    coarse cell: (id, cell, sub, code). ``codebook`` = pq codebook over
    residuals (sub, cell→codeword, centroid) — its codeword column is
    named ``cell`` by pq_fit*; it is renamed ``code`` here so the
    coarse cell keeps the name. Per probe: the nprobe nearest coarse
    cells; per (probe, cell): the probe residual vs THAT centroid, an
    m x k ADC table; then one equi-join on (cell, sub, code) and a
    fixed-sub-order fold per candidate (bit-deterministic, same rule as
    pq.adc_topk).

    The ADC table is nprobe x m x k rows PER PROBE — tiny per probe but
    proportional to the probe batch, so it is deliberately NOT
    force-broadcast (a 10M-probe offline batch would blow the driver);
    the (cell, sub, code) equi-join shuffles both sides by default and
    AQE broadcasts the table when the probe batch is actually small —
    the common online case."""
    cents = F.broadcast(coarse_centroids)
    pc = probes.crossJoin(cents).withColumn(
        "_d", _sq_dist(F.col(probe_vec), F.col("centroid"))
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("_d"), F.col("cell"))
    probe_cells = (
        pc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select(
            F.col(probe_id).alias("pid"),
            "cell",
            F.zip_with(
                F.col(probe_vec), F.col("centroid"), lambda x, y: x - y
            ).alias("pr"),
        )
    )
    p_sub = _split_keyed(probe_cells, ["pid", "cell"], "pr", m, dim)
    cb = codebook.select(
        "sub", F.col("cell").alias("code"), "centroid"
    )
    table = p_sub.join(F.broadcast(cb), "sub").select(
        "pid",
        "cell",
        "sub",
        "code",
        _sq_dist(F.col("v"), F.col("centroid")).alias("pd"),
    )
    scored = (
        codes.join(table, ["cell", "sub", "code"])
        .filter(F.col("id") != F.col("pid"))
        .groupBy("pid", "id")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "pd"))),
                    lambda st: st.getField("pd"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("adc_dist")
        )
    )
    w2 = Window.partitionBy("pid").orderBy("adc_dist", "id")
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= topk)
        .select(F.col("pid").alias(probe_id), "id", "adc_dist", "rank")
    )
