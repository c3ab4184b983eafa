"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery is real and tested — schema, partitioning,
Arrow batch shape, vectorized UDF signatures; the codec step itself is
STUBBED (the image/audio libraries are not in this container):
``decode_mode='fake'`` produces a deterministic synthetic decode so
downstream feature plumbing is exercisable end-to-end, and
``decode_mode='real'`` raises ``NotImplementedError`` at the exact
point a PIL/libav call would slot in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_bytes", T.IntegerType()),
        T.StructField("payload_sha1", T.StringType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque-binary media table from the documents table
    (deterministic; the text bytes stand in for codec payloads)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.pmod(F.col("doc_id") * 7, F.lit(1920)).cast("int").alias("width"),
        F.pmod(F.col("doc_id") * 13, F.lit(1080)).cast("int").alias("height"),
        F.pmod(F.col("doc_id") * 31, F.lit(60000)).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for decode → feature-extract: a seeded
    projection of the payload digest. Replace with the real codec +
    model call on a full deployment."""
    digest = hashlib.sha1(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little") ^ {"image": 1, "audio": 2, "video": 3}.get(kind, 0)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def decode_and_featurize(media: DataFrame, decode_mode: str = "fake") -> DataFrame:
    """mapInPandas decode/feature-extract over opaque payloads.

    Arrow batches carry the binary column; the per-batch loop is over
    payload blobs (unavoidable for codecs), everything else stays
    vectorized/columnar.
    """
    if decode_mode not in ("fake", "real"):
        raise ValueError(decode_mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if decode_mode == "real":
                raise NotImplementedError(
                    "real codecs unavailable in this container — plug "
                    "PIL/torchaudio/pyav here; the fake path exercises "
                    "the identical Spark plumbing"
                )
            payloads = pdf["payload"]
            feats = [_fake_decode(p, k) for p, k in zip(payloads, pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": [len(p or b"") for p in payloads],
                    "payload_sha1": [hashlib.sha1(p or b"").hexdigest() for p in payloads],
                    "feat": feats,
                }
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def resize_plan(media: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Image-resize plumbing: target geometry as pure JVM column math —
    aspect-preserving fit into (max_w, max_h), never upscaling, floor
    semantics, degenerate dims clamped to 1 px. The pixel resample
    itself belongs to the stubbed codec step (decode_and_featurize);
    at 100 TB the geometry stays columnar/codegen and only the pixel
    kernel pays the Python/Arrow toll."""
    w = F.greatest(F.col("width"), F.lit(1)).cast("double")
    h = F.greatest(F.col("height"), F.lit(1)).cast("double")
    scale = F.least(F.lit(float(max_w)) / w, F.lit(float(max_h)) / h, F.lit(1.0))
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        "width",
        "height",
        F.greatest(F.floor(w * scale), F.lit(1)).cast("int").alias("out_w"),
        F.greatest(F.floor(h * scale), F.lit(1)).cast("int").alias("out_h"),
        F.round(scale, 6).alias("scale"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned frame via
    sequence+explode (the decode of each frame is the stub above)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
    )
