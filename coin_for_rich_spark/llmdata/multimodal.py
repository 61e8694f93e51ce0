"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched Pandas functions.

The Spark-side architecture is real and tested: schema, partition-preserving
``mapInPandas`` plumbing, batch shapes, deterministic outputs. The actual
codec work (PIL/ffmpeg/librosa decode) is STUBBED — those libraries are not
in this container — behind ``decode_media``: pass ``fake=True`` for a
deterministic fake decoder (hash-derived "pixels"), or get a clearly-marked
``NotImplementedError`` naming the dependency.

Scale posture: media bytes stay in the executor's Arrow batches end-to-end —
never collected, never shuffled (feature extraction is map-only). For 100 TB
of media the input would be parquet/iceberg with a binary column or a
manifest of object-store URIs; either way the operator shape below
(mapInPandas over a projected binary column) is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def media_schema() -> T.StructType:
    """Typed metadata + opaque payload for a media object."""
    return T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("mime", T.StringType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary payload per document (UTF-8 bytes of the
    text, standing in for encoded media) with plausible metadata."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        (F.col(id_col) % 1920 + 1).cast("int").alias("width"),
        (F.col(id_col) % 1080 + 1).cast("int").alias("height"),
        (F.col(id_col) * 40 + 1000).cast("long").alias("duration_ms"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_media(payload: bytes, mime: str, fake: bool = False) -> list[float]:
    """Decode one media payload to a feature vector.

    STUB: real decoding requires PIL (image), soundfile/librosa (audio), or
    pyav/ffmpeg (video), none of which ship in this environment. ``fake=True``
    produces a deterministic 8-dim vector from the payload digest so the
    distributed plumbing is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            f"decoding {mime!r} requires a codec library (PIL/librosa/pyav) "
            "not available in this environment; pass fake=True for the "
            "deterministic test decoder"
        )
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:8]]


def extract_media_features(media: DataFrame, fake: bool = True, batch_hint: int | None = None) -> DataFrame:
    """Map-only feature extraction over the media table via ``mapInPandas``.

    Arrow moves whole columnar batches into pandas; each batch is processed
    vectorized-per-row in Python (the codec boundary is inherently per-item),
    and nothing leaves the executor but (id, metadata, feature).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": [
                        decode_media(p, m, fake=fake)
                        for p, m in zip(payloads, pdf["mime"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def resize_plan(
    media: DataFrame, max_w: int = 256, max_h: int = 256
) -> DataFrame:
    """Aspect-preserving resize targets for image rows.

    The dimension arithmetic is pure column algebra (deterministic IEEE
    doubles + floor, identical in any engine); the actual pixel resampling
    belongs to the stubbed codec boundary (``decode_media``) — at scale the
    resample happens inside the same Arrow batch pass as decode, with the
    target dims computed here pushed in as columns.
    """
    imgs = media.filter(F.col("mime").startswith("image/"))
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_w)) / F.col("width"),
        F.lit(float(max_h)) / F.col("height"),
    )
    return imgs.select(
        "media_id",
        "width",
        "height",
        F.round(scale, 6).alias("scale"),
        F.greatest(F.lit(1), F.floor(F.col("width") * scale).cast("int")).alias("target_w"),
        F.greatest(F.lit(1), F.floor(F.col("height") * scale).cast("int")).alias("target_h"),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (the decode of the actual frame is the stubbed step).

    Pure column algebra: ``sequence`` + ``explode`` generates the sample
    points executor-side; no driver loop, no UDF.
    """
    vids = media.filter(F.col("mime").startswith("video/"))
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
