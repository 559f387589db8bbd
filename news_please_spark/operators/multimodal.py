"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (task brief). The Spark-side plumbing — schema, partitioning,
Arrow batch shapes, UDF signatures — is real and tested; the actual
codec step is STUBBED behind an import-try because the container ships
no image/audio libraries: with PIL/librosa absent, decode produces a
deterministic fake derived from the bytes (stable across runs), or
raises NotImplementedError in strict mode.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),   # image|audio|video
        T.StructField("data", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def _try_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def _fake_features(data: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature vector: md5-seeded, unit-normed.

    Arithmetic is an explicit left-fold in float64 (not numpy pairwise
    summation) so a SQL oracle — md5 hex → little-endian uint32s →
    (u/2^32 − 0.5)/‖v‖ cast to float32 — reproduces every value
    bit-for-bit."""
    d = hashlib.md5(data or b"").digest()
    raw = (d * ((dim * 4) // len(d) + 1))[: dim * 4]
    us = [int.from_bytes(raw[4 * i : 4 * i + 4], "little") for i in range(dim)]
    v = [u / 4294967296.0 - 0.5 for u in us]
    ss = 0.0
    for x in v:
        ss += x * x
    n = math.sqrt(ss) or 1.0
    return [float(np.float32(x / n)) for x in v]


def decode_and_featurize(
    media: DataFrame, strict: bool = False, dim: int = FEATURE_DIM
) -> DataFrame:
    """media rows → (doc_id, media_ref, kind, features array<float>,
    decode_ok boolean). mapInPandas keeps the batch shape Arrow-native;
    one partition of media bytes per task — partition the input by
    pmod(xxhash64(media_ref), N) upstream so giant pages don't skew."""

    pil = _try_pil()

    def _real_image_features(raw: bytes) -> list[float] | None:
        import io

        try:
            img = pil.open(io.BytesIO(raw)).convert("L").resize((8, 8))
            arr = np.asarray(img, dtype=np.float64).flatten()[:dim]
            if arr.size < dim:
                arr = np.pad(arr, (0, dim - arr.size))
            arr = arr - arr.mean()
            n = np.linalg.norm(arr)
            return (arr / (n or 1.0)).astype(np.float32).tolist()
        except Exception:
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for data, kind in zip(pdf["data"], pdf["kind"]):
                raw = bytes(data) if data is not None else b""
                if kind == "image" and pil is not None and raw:
                    f = _real_image_features(raw)
                    if f is not None:
                        feats.append(f)
                        ok.append(True)
                        continue
                if strict:
                    raise NotImplementedError(
                        "media codecs unavailable in this container; "
                        "install PIL/librosa or run with strict=False"
                    )
                feats.append(_fake_features(raw, dim))
                ok.append(data is not None)
            out = pdf[["doc_id", "media_ref", "kind"]].copy()
            out["features"] = feats
            out["decode_ok"] = ok
            yield out

    return media.mapInPandas(
        run,
        "doc_id string, media_ref string, kind string, "
        "features array<float>, decode_ok boolean",
    )


def frame_sample_refs(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame timestamp —
    pure native (sequence + explode); the actual frame grab is the
    stubbed codec step."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "doc_id",
        "media_ref",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )
