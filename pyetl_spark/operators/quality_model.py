"""Train-offline / score-at-scale document quality classifier.

The pattern production corpus pipelines use (e.g., the CCNet/GPT-3-style
quality filters described in public papers): a SMALL labeled sample
trains a linear model offline; the learned weights then score the whole
corpus as a pure JVM expression — w·x + b through a sigmoid — so the
100 TB scoring pass is whole-stage-codegen'd column arithmetic with NO
Python in the hot path. Only training ever sees Python, and it sees a
bounded sample.

The trainer is a deterministic NumPy logistic regression (fixed
full-batch gradient descent — no RNG, no sklearn dependency): same
sample → bit-identical weights on every run, which the tests pin.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: feature expressions every caller shares (order matters — weights align)
FEATURES = ("log_len", "mean_word_len", "digit_ratio", "caps_ratio")

#: hard ceiling on rows any training collect may materialize driver-side.
#: A CONSTANT count, not a corpus fraction: a fraction (e.g. hash-mod 4)
#: scales with the corpus and becomes a multi-TB collect at 100 TB — the
#: same bug class as the uncapped BPE vocab collect fixed in r7
#: (operators/bpe.py top_word_freqs). Tests pin this cap.
TRAIN_SAMPLE_CAP = 4096


def sample_for_training(
    labeled: DataFrame, key_col: str = "doc_id", cap: int = TRAIN_SAMPLE_CAP
) -> DataFrame:
    """Deterministic constant-count training sample: order by a salted
    hash of the key (uniform, content-independent) and take the first
    ``cap`` rows. Plans as TakeOrderedAndProject — each task keeps a
    cap-sized heap, the driver merges K·tasks rows — so driver memory is
    O(cap) no matter the corpus size. The hash order makes the sample a
    uniform draw yet bit-stable across runs and partitionings."""
    return labeled.orderBy(F.xxhash64(key_col), key_col).limit(cap)


def feature_cols(text: Column) -> list[Column]:
    """The shared featurizer: cheap, pure JVM string expressions."""
    toks = F.split(text, r"\s+")
    n_chars = F.length(text).cast("double")
    n_toks = F.size(toks).cast("double")
    digits = F.length(F.regexp_replace(text, r"[^0-9]", "")).cast("double")
    caps = F.length(F.regexp_replace(text, r"[^A-Z]", "")).cast("double")
    safe = F.greatest(n_chars, F.lit(1.0))
    return [
        F.log1p(n_chars).alias("log_len"),
        (safe / F.greatest(n_toks, F.lit(1.0))).alias("mean_word_len"),
        (digits / safe).alias("digit_ratio"),
        (caps / safe).alias("caps_ratio"),
    ]


def featurize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select("*", *feature_cols(F.col(text_col)))


def train_logreg(
    X: np.ndarray, y: np.ndarray, iters: int = 300, lr: float = 0.5
) -> tuple[np.ndarray, float]:
    """Deterministic full-batch logistic regression on standardized
    features. Returns (weights ALIGNED TO RAW FEATURES, bias) — the
    standardization is folded into the weights so scoring needs no
    stats, just w·x + b."""
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd[sd == 0.0] = 1.0
    Z = (X - mu) / sd
    w = np.zeros(Z.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        g = p - y
        w -= lr * (Z.T @ g) / n
        b -= lr * g.mean()
    w_raw = w / sd
    b_raw = b - float((w * mu / sd).sum())
    return w_raw, b_raw


def score_expr(w: np.ndarray, b: float) -> Column:
    """sigmoid(w·x + b) over the FEATURES columns — pure expression, so
    the corpus-wide scoring pass never leaves the JVM."""
    z = F.lit(float(b))
    for name, wi in zip(FEATURES, w):
        z = z + F.lit(float(wi)) * F.col(name)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def fit_quality_model(
    labeled_sample: DataFrame,
    label_col: str = "label",
    iters: int = 300,
    cap: int = TRAIN_SAMPLE_CAP,
) -> tuple[np.ndarray, float]:
    """Collect the (bounded) labeled sample and train. The sample is the
    ONLY driver-sized object, and the bound is ENFORCED here, not
    advisory: the collect is limited to ``cap + 1`` rows and raises if
    the caller handed in more than ``cap`` — at 100 TB you train on
    thousands of labeled rows, not the corpus. Use
    ``sample_for_training`` to produce a compliant sample."""
    rows = labeled_sample.select(*FEATURES, label_col).limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"training sample exceeds cap ({len(rows)} > {cap} rows); "
            "bound it with sample_for_training() — never collect a "
            "corpus fraction to the driver"
        )
    X = np.array([[r[f] for f in FEATURES] for r in rows], dtype=np.float64)
    y = np.array([float(r[label_col]) for r in rows])
    return train_logreg(X, y, iters=iters)


# --------------------------------------------------------------------------
# Replay-parity variant (r15): the registry key's trainer.
#
# The NumPy trainer above is the at-scale default, but its float summation
# order (BLAS reductions) can't be replayed bit-exactly by a SQL engine, so
# ``text_quality_classifier`` stayed rows-only for 14 rounds. This variant
# makes every cross-engine hazard deterministic, turning the learned scorer
# into a Tier-A key (the same move that converted text_semdedup's k-means):
#
#   - features are rounded half-away-from-zero to a 1e-5 grid (absorbs the
#     last-ulp libm differences between Spark's Math.log1p, DuckDB's ln,
#     and Python's math.log)
#   - moments use exact integer-grid sums (order-free; DuckDB promotes
#     BIGINT sums to HUGEINT, Python ints are unbounded — both exact)
#   - each iteration quantizes the sigmoid to 7dp BEFORE the gradient, and
#     the per-row gradient contributions to a 1e9 integer grid, so the
#     gradient sum is an exact integer on both engines
#   - weights re-quantize to 9dp per iteration — any representation drift
#     dies within one step instead of compounding over 30
#   - z folds left-associatively (b + w1·s1) + w2·s2 ... — IEEE ops on
#     identical inputs are bit-identical; only summation ORDER varies
#     between engines, and here the order is pinned by the expression tree
#
# Everything else about the operator's scale posture is unchanged: training
# sees a constant-count sample, scoring is one JVM expression.
# --------------------------------------------------------------------------

import math

#: replay-trainer constants — mirrored literally in the DuckDB oracle
#: (queries/llm_text.py _quality_classifier_oracle); change them together.
PARITY_ITERS = 30
PARITY_LR = 0.5
PARITY_CLAMP = 100.0  # standardized-feature clamp (bounds the 1e9 grid)
PARITY_FEAT_DP = 5  # feature grid
PARITY_P_DP = 7  # in-training sigmoid grid
PARITY_W_DP = 9  # per-iteration weight grid
PARITY_OUT_DP = 6  # final probability grid


def _pysgn(x: float) -> float:
    return 0.0 if x == 0 else (1.0 if x > 0 else -1.0)


def _pyrnd(x: float, dp: int) -> float:
    """Python twin of parity.rnd / parity.R — same op order."""
    p = float(10**dp)
    return (_pysgn(x) * math.floor(abs(x) * p + 0.5)) / p


def _pyfxp(x: float, scale: int) -> int:
    """Python twin of parity.fxp / parity.FXP."""
    return int(_pysgn(x) * math.floor(abs(x) * float(scale) + 0.5))


def parity_feature_cols(text: Column) -> list[Column]:
    """The replay featurizer: same FEATURES family as ``feature_cols`` but
    on the 1e-5 grid, with mean_word_len clamped to 64 so the squared
    integer-grid moment sums stay inside int64 on the Spark side."""
    from pyetl_spark.parity import rnd

    n_chars = F.length(text).cast("double")
    safe = F.greatest(n_chars, F.lit(1.0))
    n_toks = F.greatest(
        F.size(F.split(text, " ")).cast("double"), F.lit(1.0)
    )
    digits = F.length(F.regexp_replace(text, "[^0-9]", "")).cast("double")
    caps = F.length(F.regexp_replace(text, "[^A-Z]", "")).cast("double")
    return [
        rnd(F.log1p(n_chars), PARITY_FEAT_DP).alias("log_len"),
        rnd(F.least(safe / n_toks, F.lit(64.0)), PARITY_FEAT_DP).alias(
            "mean_word_len"
        ),
        rnd(digits / safe, PARITY_FEAT_DP).alias("digit_ratio"),
        rnd(caps / safe, PARITY_FEAT_DP).alias("caps_ratio"),
    ]


def train_logreg_replay(
    rows: list[tuple[float, float, float, float, float]],
    iters: int = PARITY_ITERS,
    lr: float = PARITY_LR,
) -> tuple[list[float], float, list[float], list[float]]:
    """Pure-Python deterministic trainer over (x1..x4, y) tuples whose
    features already sit on the 1e-5 grid. Returns (w, b, mu, sd) in the
    STANDARDIZED space — scoring recomputes (x-mu)/sd, it does not fold.

    Every arithmetic step is either an exact integer-grid sum or a pinned
    sequence of IEEE double ops, so a SQL engine replaying the same spec
    reproduces the weights bit-for-bit (pinned by the Tier-A oracle of
    ``text_quality_classifier`` at three SFs)."""
    n = len(rows)
    if n == 0:
        raise ValueError("empty training sample")
    g5, g9 = 10**PARITY_FEAT_DP, 10**PARITY_W_DP
    mu, sd = [], []
    for j in range(4):
        s1 = sum(_pyfxp(r[j], g5) for r in rows)
        sq = sum(_pyfxp(r[j], g5) * _pyfxp(r[j], g5) for r in rows)
        m = (float(s1) / n) / 1e5
        ex2 = (float(sq) / n) / 1e10
        v = ex2 - m * m
        mu.append(m)
        sd.append(1.0 if v < 1e-12 else math.sqrt(v))
    c = PARITY_CLAMP
    samp = [
        (
            [min(max((r[j] - mu[j]) / sd[j], -c), c) for j in range(4)],
            r[4],
        )
        for r in rows
    ]
    w = [0.0, 0.0, 0.0, 0.0]
    b = 0.0
    for _ in range(iters):
        acc = [0, 0, 0, 0, 0]
        for s, y in samp:
            z = (
                (((b + w[0] * s[0]) + w[1] * s[1]) + w[2] * s[2])
                + w[3] * s[3]
            )
            p = _pyrnd(1.0 / (1.0 + math.exp(-z)), PARITY_P_DP)
            g = p - y
            for j in range(4):
                acc[j] += _pyfxp(g * s[j], g9)
            acc[4] += _pyfxp(g, g9)
        for j in range(4):
            grad = (float(acc[j]) / n) / 1e9
            w[j] = _pyrnd(w[j] - lr * grad, PARITY_W_DP)
        grad_b = (float(acc[4]) / n) / 1e9
        b = _pyrnd(b - lr * grad_b, PARITY_W_DP)
    return w, b, mu, sd


def parity_score_expr(
    w: list[float], b: float, mu: list[float], sd: list[float]
) -> Column:
    """6dp-rounded sigmoid over the standardized FEATURES columns — still
    one whole-stage-codegen'd JVM expression (the scale contract of
    ``score_expr``), with the fold order pinned to match the oracle."""
    from pyetl_spark.parity import rnd

    c = PARITY_CLAMP
    z: Column = F.lit(b)
    for name, wj, mj, sj in zip(FEATURES, w, mu, sd):
        s = (F.col(name) - F.lit(mj)) / F.lit(sj)
        s = F.least(F.greatest(s, F.lit(-c)), F.lit(c))
        z = z + F.lit(wj) * s
    return rnd(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), PARITY_OUT_DP)
