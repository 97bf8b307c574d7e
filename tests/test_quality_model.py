"""Train-offline / score-at-scale quality classifier: determinism, JVM-only
scoring plan, and recovery of a learnable labeling rule."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pyetl_spark.operators.quality_model import (
    FEATURES,
    TRAIN_SAMPLE_CAP,
    featurize,
    fit_quality_model,
    sample_for_training,
    score_expr,
    train_logreg,
)
from pyetl_spark.tables import load_tables
from tests.conftest import SF_ORACLE


def test_trainer_is_deterministic():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(500, 4))
    y = (X[:, 0] + 0.5 * X[:, 2] > 0).astype(float)
    w1, b1 = train_logreg(X, y)
    w2, b2 = train_logreg(X, y)
    assert np.array_equal(w1, w2) and b1 == b2


def test_trainer_recovers_separable_rule():
    rng = np.random.default_rng(11)
    X = rng.normal(size=(2000, 4))
    y = (X[:, 1] > 0.2).astype(float)
    w, b = train_logreg(X, y)
    p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
    acc = ((p > 0.5) == (y == 1.0)).mean()
    assert acc > 0.95


def test_scoring_is_pure_jvm_expression(spark):
    """The corpus scoring pass must compile to a single Project over the
    scan — no Python eval node, no shuffle."""
    import contextlib
    import io

    d = load_tables(spark, SF_ORACLE).documents
    feats = featurize(d)
    out = feats.select(
        "doc_id", score_expr(np.array([0.1, 0.2, -0.3, 0.4]), -1.0)
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_training_collect_is_constant_count_capped(spark):
    """The training sample must be a CONSTANT-count TakeOrdered, never a
    corpus fraction: a fraction-of-corpus collect is a ~25 TB driver
    materialization at 100 TB (the BPE-vocab bug class fixed in r7)."""
    import contextlib
    import io

    assert TRAIN_SAMPLE_CAP == 4096  # pin: changing the cap is a review event

    d = featurize(load_tables(spark, SF_ORACLE).documents)
    labeled = d.withColumn("label", (F.col("n_chars") > 120).cast("double"))
    samp = sample_for_training(labeled)
    # plan: global hash-ordered limit → TakeOrderedAndProject (per-task
    # heap of cap rows; driver merge is O(cap)), no full-sort Exchange
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        samp.explain("simple")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan
    assert samp.count() <= TRAIN_SAMPLE_CAP
    # determinism: hash order is content-stable across partitionings
    ids1 = [r["doc_id"] for r in samp.select("doc_id").collect()]
    ids2 = [
        r["doc_id"]
        for r in sample_for_training(labeled.repartition(7))
        .select("doc_id")
        .collect()
    ]
    assert ids1 == ids2


def test_fit_refuses_over_cap_sample(spark):
    """fit_quality_model hard-fails on an unbounded input instead of
    silently collecting it — the enforcement lives in the operator, not
    in caller discipline."""
    import pytest

    d = featurize(load_tables(spark, SF_ORACLE).documents)
    labeled = d.withColumn("label", (F.col("n_chars") > 120).cast("double"))
    with pytest.raises(ValueError, match="exceeds cap"):
        fit_quality_model(labeled, cap=5)


def test_classifier_query_agrees_with_rule(spark):
    """End-to-end: the declared query's accept flag must agree with the
    generating rule on >=90% of documents (the rule is linearly
    learnable from the features; training saw only a capped,
    hash-ordered constant-count sample)."""
    from pyetl_spark import registry

    registry.load_all()
    out = registry.QUERIES["text_quality_classifier"](spark, SF_ORACLE)
    d = load_tables(spark, SF_ORACLE).documents
    feats = featurize(d).select(
        "doc_id",
        (
            (F.col("n_chars") > 120) & (F.col("digit_ratio") < 0.2)
        ).alias("want"),
    )
    joined = out.join(feats, "doc_id")
    n = joined.count()
    agree = joined.filter(F.col("accept") == F.col("want")).count()
    assert n > 0 and agree / n >= 0.9, (agree, n)
    # determinism across runs
    p1 = [r["quality_prob"] for r in out.orderBy("doc_id").collect()]
    out2 = registry.QUERIES["text_quality_classifier"](spark, SF_ORACLE)
    p2 = [r["quality_prob"] for r in out2.orderBy("doc_id").collect()]
    assert p1 == p2


def test_replay_trainer_deterministic_and_learns():
    """The r15 replay-parity trainer (the registry key's trainer) must be
    bit-deterministic and still recover a separable rule — quantized
    gradients are not allowed to break learning."""
    import random

    from pyetl_spark.operators.quality_model import (
        _pyrnd,
        train_logreg_replay,
    )

    rng = random.Random(7)
    rows = []
    for _ in range(1500):
        x = [_pyrnd(rng.gauss(0, 1), 5) for _ in range(4)]
        y = 1.0 if x[1] > 0.2 else 0.0
        rows.append((x[0], x[1], x[2], x[3], y))
    w1, b1, mu1, sd1 = train_logreg_replay(rows)
    w2, b2, mu2, sd2 = train_logreg_replay(list(rows))
    assert (w1, b1, mu1, sd1) == (w2, b2, mu2, sd2)
    import math

    acc = 0
    for r in rows:
        z = b1
        for j in range(4):
            z += w1[j] * min(max((r[j] - mu1[j]) / sd1[j], -100.0), 100.0)
        p = 1.0 / (1.0 + math.exp(-z))
        acc += (p > 0.5) == (r[4] == 1.0)
    assert acc / len(rows) > 0.9, acc / len(rows)


def test_parity_scoring_is_pure_jvm_expression(spark):
    """The replay variant's scoring pass must keep the scale contract of
    score_expr: one Project over the scan, no Python, no shuffle."""
    import contextlib
    import io

    from pyetl_spark.operators.quality_model import (
        parity_feature_cols,
        parity_score_expr,
    )

    d = load_tables(spark, SF_ORACLE).documents
    feats = d.select("doc_id", *parity_feature_cols(F.col("text")))
    out = feats.select(
        "doc_id",
        parity_score_expr(
            [0.1, 0.2, -0.3, 0.4], -1.0,
            [5.0, 5.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0],
        ).alias("quality_prob"),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
