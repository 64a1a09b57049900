"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The actual codecs are NOT available in this container, so the decode kernel
is a clearly-marked deterministic fake (``_fake_decode``) behind the same
batch interface a real decoder (PIL/ffmpeg) would use — the Spark-side
plumbing (schema, batching, partition behavior, UDF signatures) is real and
tested.  Swap ``_fake_decode`` for a real decoder on a cluster with codecs
installed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("doc_id", StringType()),
    StructField("modality", StringType()),      # image | audio | video
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
    StructField("payload", BinaryType()),       # opaque encoded bytes
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("doc_id", StringType()),
    StructField("modality", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("sha1", StringType()),
    StructField("feature", ArrayType(FloatType())),  # 8-dim embedding stub
])

def _probe_real_decoders() -> bool:
    """Import-probe for real codec libraries.  Runs at module import on
    the DRIVER and on every executor Python worker (each imports this
    module), so a codec-equipped cluster routes through the real kernel
    with no config change."""
    try:
        import PIL.Image  # noqa: F401
        return True
    except Exception:
        return False


REAL_DECODERS_AVAILABLE = _probe_real_decoders()


def _fake_decode(payload: bytes, modality: str) -> np.ndarray:
    """DETERMINISTIC STAND-IN for image/audio decode.  Produces an 8-dim
    float feature from the payload digest.  A real implementation would
    decode pixels/samples here; raise if someone expects real decode."""
    digest = hashlib.sha1(payload or b"").digest()
    arr = np.frombuffer(digest[:16], dtype=np.uint8).astype(np.float32)
    return (arr[:8] - arr[8:16]) / 255.0


def decode_real(payload: bytes, modality: str) -> np.ndarray:
    """Real decode kernel, used when ``REAL_DECODERS_AVAILABLE``.  Images:
    PIL decode -> 8-dim feature (per-channel mean/std of a fixed-size
    thumbnail — cheap, deterministic).  Audio/video need ffmpeg, which has
    no import-probe-able Python binding here — they raise until a real
    binding is wired in (the honest boundary; do NOT silently fake)."""
    if modality != "image":
        raise NotImplementedError(
            f"real {modality} decoding requires ffmpeg bindings — only the "
            "PIL image path is wired; use use_real=False for the stub")
    import io

    import PIL.Image
    img = PIL.Image.open(io.BytesIO(payload)).convert("RGB") \
        .resize((8, 8), PIL.Image.BILINEAR)
    px = np.asarray(img, dtype=np.float32) / 255.0
    means = px.mean(axis=(0, 1))            # 3
    stds = px.std(axis=(0, 1))              # 3
    lum = px.mean(axis=2)
    return np.concatenate([means, stds,
                           [lum.mean(), lum.std()]]).astype(np.float32)


def extract_features(media: DataFrame, use_real: bool | None = None
                     ) -> DataFrame:
    """media(MEDIA_SCHEMA) -> features(FEATURE_SCHEMA): Arrow-batched map,
    zero shuffle; binary payloads never leave the executor as Python rows.

    ``use_real=None`` auto-probes for codec libraries on each worker and
    routes PER MODALITY: images through the real kernel when PIL is
    present, audio/video through the stub until an ffmpeg binding is wired
    (routing per batch would crash mixed-modality data on the first
    audio row).  ``False`` pins the deterministic stub everywhere (the
    golden-parity path the driver oracle compares against); ``True``
    forces the real kernel for ALL modalities — raising loudly where no
    real kernel exists rather than silently faking."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = REAL_DECODERS_AVAILABLE if use_real is None else use_real

        def kernel(raw: bytes, modality: str) -> np.ndarray:
            if use_real is True:
                return decode_real(raw, modality)
            if real and modality == "image":
                return decode_real(raw, modality)
            return _fake_decode(raw, modality)

        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                raw = bytes(payload) if payload is not None else b""
                feats.append([float(x) for x in kernel(raw, modality)])
                shas.append(hashlib.sha1(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": sizes,
                "sha1": shas,
                "feature": feats,
            })

    return media.select("media_id", "doc_id", "modality", "payload") \
        .mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_ts_ms) rows — pure
    expression (sequence + explode), the real frame grab being the decode
    kernel's job.  Demonstrates bounded fan-out of media rows."""
    return (media.where(F.col("modality") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))


def synth_media_rows(n: int = 64, seed: int = 42) -> list:
    """Deterministic synthetic media rows (payload = seeded bytes) — pure
    Python, shared by the Spark table builder AND the single-node golden
    generator (tools/oracle/make_entry_golden.py), so the golden features
    verify the distributed Arrow plumbing against local evaluation."""
    import random
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(64 + (i % 5) * 32))
        rows.append((
            f"m{i:04d}", f"doc{i % 16:06d}", modality,
            {"image": "image/png", "audio": "audio/wav",
             "video": "video/mp4"}[modality],
            64 + i % 512, 48 + i % 256,
            (i % 10) * 1000 if modality == "video" else 0,
            payload))
    return rows


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42
                ) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    return spark.createDataFrame(synth_media_rows(n, seed),
                                 schema=MEDIA_SCHEMA)
