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

def _probe_real_decoders() -> dict:
    """Per-modality import-probe for real codec libraries: PIL for images,
    PyAV (the import-probe-able ffmpeg binding) for audio/video.

    ``extract_features(use_real=None)`` calls this LAZILY inside the Arrow
    batch fn, so the probe runs on each executor Python worker at task
    time — on a heterogeneous cluster (driver has PIL, an executor
    doesn't) each worker routes by what IT has instead of inheriting the
    driver's answer via cloudpickle capture."""
    out = {}
    try:
        import PIL.Image  # noqa: F401
        out["image"] = True
    except Exception:
        out["image"] = False
    try:
        import av  # noqa: F401  (PyAV — ffmpeg binding)
        out["audio"] = out["video"] = True
    except Exception:
        out["audio"] = out["video"] = False
    return out


# NOTE: the old module-level REAL_DECODERS_AVAILABLE bool was removed —
# routing probes per worker inside extract_features; a driver-side
# snapshot would be wrong on heterogeneous clusters AND truthiness-traps
# callers now that the probe returns a per-modality dict.


def _fake_decode(payload: bytes, modality: str) -> np.ndarray:
    """DETERMINISTIC STAND-IN for image/audio decode.  Produces an 8-dim
    float feature from the payload digest.  A real implementation would
    decode pixels/samples here; raise if someone expects real decode."""
    digest = hashlib.sha1(payload or b"").digest()
    arr = np.frombuffer(digest[:16], dtype=np.uint8).astype(np.float32)
    return (arr[:8] - arr[8:16]) / 255.0


def decode_real(payload: bytes, modality: str) -> np.ndarray:
    """Real decode kernels.  Images: PIL decode -> 8-dim feature
    (per-channel mean/std + luminance mean/std of a fixed-size thumbnail —
    cheap, deterministic).  Audio/video: PyAV (ffmpeg) decode -> 8-dim
    sample/pixel statistics.  Each modality raises loudly when its library
    is absent (the honest boundary; do NOT silently fake)."""
    import io
    if modality == "image":
        import PIL.Image
        img = PIL.Image.open(io.BytesIO(payload)).convert("RGB") \
            .resize((8, 8), PIL.Image.BILINEAR)
        px = np.asarray(img, dtype=np.float32) / 255.0
        means = px.mean(axis=(0, 1))            # 3
        stds = px.std(axis=(0, 1))              # 3
        lum = px.mean(axis=2)
        return np.concatenate([means, stds,
                               [lum.mean(), lum.std()]]).astype(np.float32)
    if modality in ("audio", "video"):
        try:
            import av
        except ImportError as exc:
            raise NotImplementedError(
                f"real {modality} decoding requires the PyAV ffmpeg "
                "binding (`import av` failed); use use_real=False for the "
                "stub") from exc
        container = av.open(io.BytesIO(payload))
        if modality == "audio":
            chunks = [frame.to_ndarray().astype(np.float32).ravel()
                      for frame in container.decode(audio=0)]
            x = (np.concatenate(chunks) if chunks
                 else np.zeros(1, dtype=np.float32))
            return np.array([
                x.mean(), x.std(), x.min(), x.max(),
                np.abs(x).mean(), np.sqrt((x * x).mean()),
                float((np.diff(np.signbit(x)) != 0).mean()) if x.size > 1
                else 0.0,
                float(x.size)], dtype=np.float32)
        # video: bounded frame sample (first 8 frames), pixel statistics
        frames = []
        for i, frame in enumerate(container.decode(video=0)):
            if i >= 8:
                break
            frames.append(frame.to_ndarray(format="rgb24")
                          .astype(np.float32) / 255.0)
        if not frames:
            return np.zeros(8, dtype=np.float32)
        px = np.stack(frames)
        means = px.mean(axis=(0, 1, 2))         # 3
        stds = px.std(axis=(0, 1, 2))           # 3
        lum = px.mean(axis=3)
        return np.concatenate([means, stds,
                               [lum.mean(), lum.std()]]).astype(np.float32)
    raise ValueError(f"unknown modality {modality!r}")


def extract_features(media: DataFrame, use_real: bool | None = None
                     ) -> DataFrame:
    """media(MEDIA_SCHEMA) -> features(FEATURE_SCHEMA): Arrow-batched map,
    zero shuffle; binary payloads never leave the executor as Python rows.

    ``use_real=None`` auto-probes for codec libraries ON EACH WORKER (the
    probe call is inside the batch fn, so every executor Python worker
    evaluates it at task time — not a cloudpickled driver snapshot) and
    routes PER MODALITY: images through the real kernel when PIL is
    present, audio/video through the real PyAV kernel when `av` imports
    (routing per batch would crash mixed-modality data on the first
    audio row).  ``False`` pins the deterministic stub everywhere (the
    golden-parity path the driver oracle compares against); ``True``
    forces the real kernel for ALL modalities — raising loudly where no
    real kernel exists rather than silently faking."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        probe = _probe_real_decoders() if use_real is None else {}

        def kernel(raw: bytes, modality: str) -> np.ndarray:
            if use_real is True:
                return decode_real(raw, modality)
            if use_real is None and probe.get(modality):
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
