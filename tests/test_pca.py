"""PCA top-component operator: direction recovery, determinism,
projection plumbing, fixture smoke."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyetl_spark.operators.pca import project, top_component
from tests.conftest import SF_ORACLE


def _planted(spark, direction, n=400, noise=0.05, dim=8):
    """Rows = t * direction + small orthogonal noise, deterministic."""
    d = np.asarray(direction, dtype=float)
    d /= np.linalg.norm(d)
    rows = []
    for i in range(n):
        t = math.sin(i * 0.7) * 3.0
        noise_vec = [
            noise * math.cos(0.31 * i * (j + 1)) for j in range(dim)
        ]
        v = (t * d + np.array(noise_vec)).tolist()
        rows.append((i, v))
    return spark.createDataFrame(rows, ["id", "embedding"])


def test_recovers_planted_direction(spark):
    direction = [1.0, -2.0, 0.5, 0.0, 3.0, -1.0, 0.25, 2.0]
    df = _planted(spark, direction)
    comp, lam, mean = top_component(df, dim=8)
    d = np.asarray(direction) / np.linalg.norm(direction)
    cos = abs(float(np.dot(comp, d)))
    assert cos > 0.99, cos
    assert lam > 0


def test_sign_canonical_and_deterministic(spark):
    df = _planted(spark, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    c1, l1, m1 = top_component(df, dim=8)
    c2, l2, m2 = top_component(df, dim=8)
    assert np.allclose(c1, c2)
    assert l1 == pytest.approx(l2)
    # canonical sign: the largest-|coord| entry is positive
    assert c1[int(np.argmax(np.abs(c1)))] > 0


def test_projection_matches_numpy(spark):
    df = _planted(spark, [1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], n=50)
    comp, _, mean = top_component(df, dim=8)
    rows = project(df, comp, mean).select("id", "embedding", "pc1").collect()
    for r in rows:
        want = float(np.dot(np.array(r["embedding"]) - mean, comp))
        assert r["pc1"] == pytest.approx(want, abs=1e-9)


def test_fixture_embeddings_smoke(spark):
    from pyetl_spark.tables import load_tables

    emb = load_tables(spark, SF_ORACLE).embeddings
    comp, lam, mean = top_component(emb, dim=64)
    assert comp.shape == (64,)
    assert abs(np.linalg.norm(comp) - 1.0) < 1e-9
    assert lam > 0
    assert mean.shape == (64,)
