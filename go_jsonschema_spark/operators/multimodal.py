"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (image/audio libraries are not in this
container): :func:`decode_image` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder produces
byte-derived features — the Spark-side plumbing (schema, batch iteration,
partition sizing) is real and tested; swapping the stub for Pillow/ffmpeg
on a real cluster changes one function body.

Schema convention:

    media(media_id string, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int, duration_ms:int>)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["MEDIA_SCHEMA", "FEATURE_SCHEMA", "extract_features", "synth_media"]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes int, checksum bigint, "
    "feature array<float>"
)


def _decode_fake(payload: bytes, n_feat: int = 8) -> list[float]:
    """Deterministic fake decode: byte-histogram features.  Stands in for
    the real decoder (Pillow / torchaudio / ffmpeg) absent from this
    container."""
    if payload is None:
        return [0.0] * n_feat
    buckets = [0] * n_feat
    for b in payload:
        buckets[b % n_feat] += 1
    total = max(len(payload), 1)
    return [round(c / total, 6) for c in buckets]


def decode_image(payload: bytes, n_feat: int = 8) -> list[float]:
    """Real decoder: Pillow when importable — decode, grayscale, 8×8
    downsample, ``n_feat``-bucket intensity histogram (normalized).  On a
    cluster image this is the live path; in this sandbox (no Pillow) it
    raises and ``fake=True`` exercises the identical Spark plumbing."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - PIL absent in sandbox
        raise NotImplementedError(
            "image decoding requires Pillow, not installed in this "
            "sandbox; use extract_features(..., fake=True) which exercises "
            "the identical Spark plumbing"
        ) from e
    import io

    if payload is None:
        return [0.0] * n_feat
    img = Image.open(io.BytesIO(payload)).convert("L").resize((8, 8))
    px = list(img.getdata())
    buckets = [0] * n_feat
    for p in px:
        buckets[int(p) * n_feat // 256] += 1
    return [round(c / len(px), 6) for c in buckets]


def extract_features(
    media: DataFrame, *, n_feat: int = 8, fake: bool = True, batch_rows: int = 1024
) -> DataFrame:
    """Feature extraction over binary payloads with ``mapInPandas``.

    Arrow ships each partition to Python in batches; the UDF is a batch
    iterator, so decoder state (model weights, in the real version) loads
    once per task, not per row.  Output schema is fixed → downstream plans
    stay fully typed."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        decoder = _decode_fake if fake else (lambda p: decode_image(p))
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    # crc32: deterministic across workers/runs, unlike
                    # Python's per-process-salted hash() — and the same
                    # polynomial as Spark's native F.crc32
                    "checksum": pdf["payload"].map(
                        lambda p: 0 if p is None else zlib.crc32(bytes(p))
                    ),
                    "feature": pdf["payload"].map(
                        lambda p: decoder(None if p is None else bytes(p))
                    ),
                }
            )
            yield out

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


RESIZED_SCHEMA = "media_id string, width int, height int, payload binary"
FRAMES_SCHEMA = "media_id string, frame_idx int, frame binary"


def resize_images(
    media: DataFrame, *, width: int = 32, height: int = 32, fake: bool = True
) -> DataFrame:
    """Image resize over mapInPandas.  ``fake=True`` stubs the pixel work
    (deterministic byte truncation/padding to width*height); ``fake=False``
    uses Pillow's ``Image.resize`` — only the inner lambda changes; batch
    shape, schema and partitioning are identical on both paths."""
    if not fake:
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - PIL absent in sandbox
            raise NotImplementedError(
                "Pillow not installed in this sandbox; use fake=True"
            ) from e

    target = width * height

    def _fake_resize(p: bytes) -> bytes:
        return (bytes(p) * (target // max(len(p), 1) + 1))[:target]

    def _pil_resize(p: bytes) -> bytes:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(bytes(p))).convert("L")
        return img.resize((width, height)).tobytes()

    one = _fake_resize if fake else _pil_resize

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(one),
                }
            )

    return media.mapInPandas(_resize, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, *, every_ms: int = 250, fake: bool = True
) -> DataFrame:
    """Video frame sampling over mapInPandas: one output row per sampled
    frame index (duration_ms / every_ms frames).  Frame extraction is
    stubbed (fake frame = payload slice keyed by index); the real version
    calls ffmpeg/pyav in the same batch loop."""
    if not fake:
        raise NotImplementedError("ffmpeg/pyav not installed in this sandbox")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            if pdf.empty:
                yield pd.DataFrame(
                    {"media_id": pd.Series(dtype=object),
                     "frame_idx": pd.Series(dtype="int32"),
                     "frame": pd.Series(dtype=object)}
                )
                continue
            # vectorized explode: one np.repeat over the batch instead of
            # per-row iterrows; the per-frame slice stays a cheap list
            # comprehension over (payload, idx) pairs (the real decoder
            # would batch-decode here)
            durs = pdf["meta"].map(lambda m: (m["duration_ms"] or 0))
            n_frames = np.maximum(durs.to_numpy() // every_ms, 1)
            ids = np.repeat(pdf["media_id"].to_numpy(), n_frames)
            payloads = np.repeat(pdf["payload"].to_numpy(), n_frames)
            idx = np.concatenate([np.arange(n) for n in n_frames])
            frames = [
                bytes(p or b"")[i % max(len(p or b""), 1):][:16]
                for p, i in zip(payloads, idx)
            ]
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idx.astype("int32"),
                 "frame": frames}
            )

    return media.mapInPandas(_frames, FRAMES_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes).
    Partition count is sized to the row count — spinning up one Python
    worker per core for a 128-row table costs more than the work."""
    n_part = max(1, min(spark.sparkContext.defaultParallelism, n // 64))
    return spark.range(0, n, numPartitions=n_part).select(
        F.format_string("m%06d", F.col("id")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(1000).alias("duration_ms"),
        ).alias("meta"),
    )
