"""Multimodal columns (north-star extension): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched pandas
UDFs over ``mapInPandas``.

The container has no image/audio libraries, so the DECODE step is stubbed
(SURVEY/north-star instruction): ``_decode_image_stub`` raises
NotImplementedError unless ``allow_fake=True``, in which case it produces a
*deterministic fake* decode (seeded by the payload bytes) so the Spark-side
plumbing — schema, batch iteration, constant-memory streaming, partitioning
— is real and testable. Swapping in PIL/librosa later changes ONE function.

Scale design: media blobs are large; everything here streams Arrow batches
through Python with per-batch memory only, keeps blobs out of shuffles
(feature extraction happens before any wide op), and carries metadata in a
typed struct column so filters on width/height/codec stay JVM-side and
pushdown-eligible.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: typed metadata struct carried next to every media blob
MEDIA_META_DDL = (
    "media_id long, kind string, width int, height int,"
    " n_frames int, sample_rate int"
)

FEATURE_DIM = 32


def _decode_image_stub(payload: bytes, allow_fake: bool) -> np.ndarray:
    """STUB decode (no imaging libs in this container).

    With ``allow_fake``: a deterministic pseudo-image seeded from the
    payload's sha256 — stable across runs/machines, so downstream tests
    can assert exact values. Without: NotImplementedError, marking the
    integration point for a real decoder (PIL.Image.open etc.).
    """
    if not allow_fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; pass allow_fake=True for the deterministic stub"
        )
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random((8, 8), dtype=np.float64)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: wrap each document's text bytes as a media blob +
    metadata struct (the fixtures ship no real media; the blob column is
    genuinely BinaryType so the pipeline shape is production-true)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("doc_id").alias("media_id"),
            F.lit("image").alias("kind"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(1).alias("n_frames"),
            F.lit(0).alias("sample_rate"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    allow_fake: bool = True,
) -> DataFrame:
    """binary payload → FEATURE_DIM float feature vector via mapInPandas.

    Batch shape contract: input batches stream one Arrow record batch at a
    time; output yields one DataFrame per input batch (constant memory —
    never accumulate across batches).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                img = _decode_image_stub(bytes(payload), allow_fake)
                flat = img.flatten()
                # fake "embedding": strided means down to FEATURE_DIM
                feats.append(
                    [
                        float(flat[i::FEATURE_DIM].mean())
                        for i in range(FEATURE_DIM)
                    ]
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": feats}
            )

    return media.mapInPandas(
        run, f"{id_col} long, features array<double>"
    )


def resize_images(
    media: DataFrame,
    out_w: int = 4,
    out_h: int = 4,
    allow_fake: bool = True,
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-emit as binary (float64 LE
    bytes) + updated metadata. Same mapInPandas streaming contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads, metas = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                img = _decode_image_stub(bytes(payload), allow_fake)
                ys = np.linspace(0, img.shape[0] - 1, out_h).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, out_w).astype(int)
                small = img[np.ix_(ys, xs)]
                out_payloads.append(small.tobytes())
                m = dict(meta)
                m["width"], m["height"] = out_w, out_h
                metas.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(
        run, f"media_id long, payload binary, meta struct<{MEDIA_META_DDL}>"
    )


def sample_frames(
    media: DataFrame, every_nth: int = 2, allow_fake: bool = True
) -> DataFrame:
    """Video-style frame sampling: explode each blob into (frame_idx,
    frame_payload) rows for every nth frame — the decode stub fakes frames
    as row-slices of the pseudo-image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                img = _decode_image_stub(bytes(payload), allow_fake)
                for i in range(0, img.shape[0], every_nth):
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(img[i].tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(
        run, "media_id long, frame_idx int, frame binary"
    )
