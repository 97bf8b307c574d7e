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
