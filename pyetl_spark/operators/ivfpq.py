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

#: build-parameter stamp carried in the codes frame's ``code`` field
#: metadata (parquet round-trips Spark schema metadata — the same
#: mechanism as minhash_index's band_hash stamp, for the same reason:
#: an append encoded under different (m, dim, k) silently corrupts the
#: index — codes from different codebooks join nonsense — instead of
#: erroring)
IVFPQ_STAMP_KEYS = ("ivfpq.m", "ivfpq.dim", "ivfpq.k")


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
    exclude_self: bool = False,
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
    the common online case.

    ``exclude_self``: when the probe ids share the corpus id space
    (self-query benchmarks, dedup-style "nearest OTHER vector" runs),
    True drops candidates whose id equals the probe id. Default False —
    same convention as pq.adc_topk: for external probes a numeric-id
    collision with a corpus vec_id must NOT silently drop a legitimate
    neighbor (r12 ADVICE). Callers that self-query opt in explicitly.

    .. note:: **Changed in r13** — before r13 this function ALWAYS
       filtered self-matches (there was no parameter). Callers written
       against the pre-r13 signature that self-query now see the probe
       itself as rank-1 with adc_dist ~0 unless they pass
       ``exclude_self=True``. All in-repo callers were updated in the
       same commit; the default was flipped (not kept) so the whole
       operator library shares one convention — pq.adc_topk, ivf, LSH
       and IVF-PQ all treat self-exclusion as opt-in (r13 ADVICE asked
       for this notice).

    Probe-side stamp check (r13, mirroring
    minhash_assign_incremental): when ``codes`` carries the complete
    (m, dim, k) build stamp, a caller whose (m, dim) disagree fails
    fast here — a mismatched search splits the probe residual on the
    wrong boundaries and joins codes against the wrong ADC rows,
    returning confidently wrong neighbors with no error anywhere. k is
    not a search parameter (it lives in the codebook), so only the two
    caller-supplied values are compared (``compare_keys`` — the check
    itself is operators/stamps.check_stamp, shared with the append
    side and the MinHash family; r13 ADVICE)."""
    from pyetl_spark.operators.stamps import check_stamp

    check_stamp(
        codes,
        field="code",
        stamp_keys=IVFPQ_STAMP_KEYS,
        label="(m, dim)",
        expected=(m, dim),
        caller="ivfpq_topk",
        consequence=(
            "a mismatched search splits probe residuals on the wrong "
            "subvector boundaries and returns wrong neighbors without "
            "an error"
        ),
        compare_keys=IVFPQ_STAMP_KEYS[:2],
    )
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
    joined = codes.join(table, ["cell", "sub", "code"])
    if exclude_self:
        joined = joined.filter(F.col("id") != F.col("pid"))
    scored = (
        joined.groupBy("pid", "id")
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


def ivfpq_encode(
    residuals: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    m: int = 8,
    dim: int = 64,
    k: int = 16,
) -> DataFrame:
    """(id, cell, sub, code): the inverted-file rows ``ivfpq_topk``
    searches — PQ codes of the residual frame joined back to the coarse
    cell. ``residuals`` is ``ivfpq_residuals`` output (id, cell, r).

    The build parameters are stamped into the ``code`` field metadata
    so the append path (``ivfpq_index_delta``) can fail fast when a
    maintenance job's (m, dim, k) disagree with the index it extends —
    a mismatch would otherwise join day-2 codes against the wrong
    codewords and silently return garbage distances, never an error."""
    from pyetl_spark.operators.pq import pq_encode

    codes = pq_encode(
        residuals, codebook, id_col=id_col, vec_col="r", m=m, dim=dim
    )
    return codes.join(
        residuals.select(F.col(id_col).alias("id"), "cell"), "id"
    ).select(
        "id",
        "cell",
        "sub",
        F.col("code").alias(
            "code",
            metadata={"ivfpq.m": m, "ivfpq.dim": dim, "ivfpq.k": k},
        ),
    )


def _check_codes_stamp(
    codes: DataFrame, m: int, dim: int, k: int, caller: str
) -> None:
    """Raise if ``codes`` carries an (m, dim, k) stamp in its ``code``
    field metadata that disagrees with the caller's parameters.
    All-keys-or-nothing contract and the check itself live in
    operators/stamps.check_stamp (shared with the MinHash band_hash
    stamp, r13)."""
    from pyetl_spark.operators.stamps import check_stamp

    check_stamp(
        codes,
        field="code",
        stamp_keys=IVFPQ_STAMP_KEYS,
        label="(m, dim, k)",
        expected=(m, dim, k),
        caller=caller,
        consequence=(
            "appending codes encoded under a different codebook layout "
            "silently corrupts every future search over the mixed index"
        ),
    )


def ivfpq_index_delta(
    new_vecs: DataFrame,
    coarse_centroids: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "e",
    m: int = 8,
    dim: int = 64,
    k: int = 16,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Code rows for a NEW batch of vectors against an EXISTING IVF-PQ
    index — the maintenance leg of the persisted-index lifecycle
    (VERDICT r12 item 5, mirroring minhash_index_delta): assign each
    new vector to its nearest EXISTING coarse centroid (broadcast, the
    centroid table is k rows), compute its residual, and encode with
    the EXISTING codebook. No retrain anywhere: cost is
    O(|new| · coarse_k + |new| · m · k) distance evaluations — a daily
    ingest touches only its own rows, never the corpus, exactly like
    the MinHash delta. The caller appends the returned rows to the
    persisted ``codes`` table (parquet append), after which the new
    vectors are searchable by every subsequent ``ivfpq_topk``.

    The delta ITSELF carries the stamped (m, dim, k) metadata (via
    ``ivfpq_encode``) — required, because a parquet read of the mixed
    index samples whichever file's footer it lists first. Pass
    ``codes`` (the table being appended to, or any frame carrying its
    stamp) to verify the append's parameters against the index BEFORE
    producing rows.

    Drift caveat (the honest limit of append-only maintenance): the
    coarse centroids and codebook were fit on the ORIGINAL corpus; a
    distribution shift in incoming vectors degrades quantization
    quality silently — recall falls, no error fires. Monitor
    ``ivfpq_batch_mse`` of each batch against the build-time value and
    retrain when the ratio drifts (the nightly-rebuild trigger)."""
    from pyetl_spark.operators.ivf import ivf_assign

    if codes is not None:
        _check_codes_stamp(codes, m, dim, k, "ivfpq_index_delta")
    assigned = ivf_assign(
        new_vecs, coarse_centroids, id_col=id_col, vec_col=vec_col
    )
    res = ivfpq_residuals(
        assigned, coarse_centroids, id_col=id_col, vec_col=vec_col
    )
    return ivfpq_encode(res, codebook, id_col=id_col, m=m, dim=dim, k=k)


def ivfpq_batch_mse(
    vecs: DataFrame,
    coarse_centroids: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "e",
    m: int = 8,
    dim: int = 64,
) -> float:
    """Residual-space reconstruction MSE of a vector batch under an
    existing index's centroids + codebook — the DRIFT metric for
    append-only maintenance. Compare a new batch's value to the
    build-time corpus value (compute both with this function): a ratio
    drifting above ~2x says the fit no longer represents incoming data
    and the index should be rebuilt rather than appended to. Runs one
    scalar aggregate (an action) — call it from maintenance jobs, not
    inside transformations."""
    from pyetl_spark.operators.ivf import ivf_assign
    from pyetl_spark.operators.pq import reconstruction_mse

    res = ivfpq_residuals(
        ivf_assign(vecs, coarse_centroids, id_col=id_col, vec_col=vec_col),
        coarse_centroids,
        id_col=id_col,
        vec_col=vec_col,
    )
    return reconstruction_mse(
        res, codebook, id_col=id_col, vec_col="r", m=m, dim=dim
    )
