"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata, and Pandas-UDF decode/feature plumbing.

The container ships no image/audio libraries, so the actual decoders are
STUBS: ``decode_image_features`` raises ``NotImplementedError`` unless a
decoder is importable, and ``fake_feature_extractor`` is the
deterministic stand-in that keeps the Spark-side plumbing (schema,
Arrow batch shape, partition behavior) real and testable.

Scale design: binary payloads never leave the executors; metadata
extraction is a Catalyst projection, and feature extraction is
``mapInPandas`` over Arrow batches — the decode cost parallelizes
per-partition with zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema for binary assets: payload + typed metadata (the lakehouse
#: pattern for multimodal tables).
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("byte_length", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Test/demo source: derive a binary payload column from text (UTF-8
    bytes) so the multimodal plumbing can run on the documents table."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("text/plain").alias("media_type"),
    )


def binary_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata extraction over an opaque binary column — pure
    Catalyst projection (byte length + content digest)."""
    c = F.col(content_col)
    return df.withColumns(
        {
            "byte_length": F.length(c).cast("long"),
            "content_md5": F.md5(c),
        }
    )


FEATURE_SCHEMA = "asset_id long, byte_length long, first_byte int, byte_sum_mod long, mean_byte double"


def fake_feature_extractor(df: DataFrame) -> DataFrame:
    """Deterministic stand-in for a real decoder: per-asset byte statistics
    computed in Arrow-batched pandas (``mapInPandas``) — the exact
    batch shape / signature a real image decode would use."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "byte_length": content.map(len).astype("int64"),
                    "first_byte": content.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                    "byte_sum_mod": content.map(
                        lambda b: sum(b) % 1_000_003
                    ).astype("int64"),
                    "mean_byte": content.map(
                        lambda b: (sum(b) / len(b)) if len(b) else 0.0
                    ).astype("float64"),
                }
            )

    return df.select("asset_id", "content").mapInPandas(extract, FEATURE_SCHEMA)


def decode_image_features(df: DataFrame) -> DataFrame:
    """Real image decode (resize + pixel stats). STUB: the runtime has no
    image codec; raises unless PIL is importable. The mapInPandas shape
    is identical to ``fake_feature_extractor``."""
    try:
        import PIL.Image  # noqa: F401, PLC0415
    except ImportError as exc:  # pragma: no cover - exercised via test
        raise NotImplementedError(
            "image decoding requires an image codec (PIL) not present in "
            "this runtime; use fake_feature_extractor for plumbing tests"
        ) from exc

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        from PIL import Image

        for pdf in batches:
            feats = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                img = Image.open(io.BytesIO(content)).convert("L").resize((8, 8))
                pixels = list(img.getdata())
                feats.append(
                    (asset_id, len(content), pixels[0], sum(pixels) % 1_000_003,
                     sum(pixels) / len(pixels))
                )
            yield pd.DataFrame(
                feats,
                columns=["asset_id", "byte_length", "first_byte", "byte_sum_mod", "mean_byte"],
            )

    return df.select("asset_id", "content").mapInPandas(extract, FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# Resize / frame-sample plumbing
# --------------------------------------------------------------------------

RESIZED_SCHEMA = "asset_id long, media_type string, width int, height int, content binary"


def fake_resize(df: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Deterministic stand-in for image resize: maps each payload to a
    fixed-size (width*height)-byte thumbnail by striding over the source
    bytes — the exact mapInPandas signature/batch shape of a real
    ``PIL.Image.resize``, with output payload size bounded the way a real
    thumbnail pipeline bounds it (decode cost stays on the executors,
    output shuffles at thumbnail size, never source size)."""
    n_out = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def thumb(b: bytes) -> bytes:
                if not len(b):
                    return bytes(n_out)
                step = max(len(b) // n_out, 1)
                return bytes(b[min(i * step, len(b) - 1)] for i in range(n_out))

            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "content": pdf["content"].map(thumb),
                }
            )

    return df.select("asset_id", "media_type", "content").mapInPandas(
        resize, RESIZED_SCHEMA
    )


FRAME_SCHEMA = "asset_id long, frame_no int, frame_offset long, frame md5 string".replace(
    "frame md5", "frame_md5"
)


def fake_frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic stand-in for video frame sampling: treat the payload
    as ``n_frames`` equal-length segments ("frames"), emit one row per
    sampled frame with its byte offset and digest. Output is LONGER than
    input (explode-shaped mapInPandas) — the real pattern for
    video -> frame-table expansion, where per-frame rows feed the image
    pipeline above."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                if not len(content):
                    continue
                seg = max(len(content) // n_frames, 1)
                for i in range(min(n_frames, len(content))):
                    off = i * seg
                    frame = content[off : off + seg]
                    rows.append(
                        (asset_id, i, off, hashlib.md5(frame).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_no", "frame_offset", "frame_md5"]
            )

    return df.select("asset_id", "content").mapInPandas(sample, FRAME_SCHEMA)
