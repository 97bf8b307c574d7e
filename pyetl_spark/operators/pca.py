"""Top principal component of an embedding column — distributed moment
aggregation + driver-side power iteration.

The scale-correct split: the DATA-sized work (sum of outer products
x·xᵀ, sum of x, count) runs distributed as an Arrow-batched
``mapInPandas`` partial aggregation — each batch contributes ONE
(dim², dim, 1) moment row, numpy doing the outer products vectorized —
and the DIMENSION-sized work (eigenvector of the dim×dim covariance)
runs on the driver in numpy, where a 64×64 power iteration is
microseconds. This mirrors how MLlib computes column stats: never ship
rows to the driver, only moment blocks (#partitions × dim² doubles).

A pure-DataFrame covariance via double posexplode would blow each row
up dim²× before aggregating — correct, but 4096× shuffle volume at
dim=64; the mapInPandas form keeps the blowup inside a numpy batch.

North-star relevance: the top component drives embedding whitening /
de-biasing and 1-D quantization binning during corpus curation
(see vec_quantize_int8, dedup_embedding_quantized).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ship_module_by_value() -> None:
    """Ship this module inside task closures (see multimodal.py) so the
    mapInPandas closure works when the repo isn't on executor paths."""
    from pyspark import cloudpickle

    import pyetl_spark.operators.pca as _self

    cloudpickle.register_pickle_by_value(_self)


def _moments(vec_col: str, dim: int):
    """mapInPandas fn: per Arrow batch, one row of flattened moments."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "sum_outer": [(x.T @ x).ravel().tolist()],
                    "sum_vec": [x.sum(axis=0).tolist()],
                    "n": [len(x)],
                }
            )

    return run


def top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    max_iters: int = 100,
    tol: float = 1e-10,
    seed_dim_spread: bool = True,
) -> tuple[np.ndarray, float, np.ndarray]:
    """Return (component, eigenvalue, mean) of the column's covariance.

    Deterministic: moments are exact sums reduced in numpy float64 on
    the driver (batch order affects low-order bits only — callers
    compare directions with tolerances, never hashes); the iteration
    starts from a fixed seed and the sign is canonicalized so the
    largest-|coordinate| entry is positive.
    """
    _ship_module_by_value()
    if dim is None:
        dim = len(
            df.select(vec_col).filter(F.size(vec_col) > 0).first()[0]
        )
    schema = (
        "sum_outer array<double>, sum_vec array<double>, n bigint"
    )
    parts = df.select(vec_col).mapInPandas(
        _moments(vec_col, dim), schema=schema
    ).collect()
    if not parts:
        raise ValueError("empty input")
    so = np.zeros((dim, dim))
    sv = np.zeros(dim)
    n = 0
    for r in parts:
        so += np.array(r["sum_outer"]).reshape(dim, dim)
        sv += np.array(r["sum_vec"])
        n += r["n"]
    mean = sv / n
    cov = so / n - np.outer(mean, mean)
    # fixed deterministic seed: spread over dimensions, no RNG
    v = np.cos(np.arange(dim, dtype=np.float64) + 1.0)
    v /= np.linalg.norm(v)
    lam = 0.0
    for _ in range(max_iters):
        w = cov @ v
        nw = np.linalg.norm(w)
        if nw == 0.0:
            break
        w /= nw
        if abs(nw - lam) < tol:
            v, lam = w, nw
            break
        v, lam = w, nw
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    return v, float(lam), mean


def project(
    df: DataFrame,
    component: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pc1",
):
    """Add the centered 1-D projection (x−μ)·v as ``out_col`` —
    JVM-side via zip_with/aggregate over literal arrays (no Python in
    the scan path; the component is dimension-sized, broadcast as a
    literal into the plan)."""
    comp_lit = F.array(*[F.lit(float(c)) for c in component])
    mean_lit = F.array(*[F.lit(float(m)) for m in mean])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), mean_lit, lambda x, m: x - m
    )
    dot = F.aggregate(
        F.zip_with(centered, comp_lit, lambda x, c: x * c),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.withColumn(out_col, dot)
