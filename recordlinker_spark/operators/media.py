"""Multimodal (media-span) plumbing: binary payloads + typed metadata.

The input documents interleave media spans (``kind='media'``,
``media_ref`` an opaque URI) with text spans; linkage ignores them but
a training-data pipeline needs to move, decode, and featurize them.
This module provides the Spark-side plumbing — schemas, partitioning,
batch shapes — with the actual codec calls STUBBED (image/audio
libraries are not in this container): ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic synthetic decode so the distributed path is fully
testable.

Operators:

* extract_media_refs — explode media spans into a flat
  ``(doc_id, media_idx, media_ref, media_type)`` table (type inferred
  from the URI suffix; unknown -> 'binary').
* fetch_payloads — attach a ``payload: binary`` column.  STUB: real
  deployments read object storage per partition (``mapInPandas`` so
  one connection per batch, never per row); here it deterministically
  fabricates bytes from the ref.
* decode_features — ``mapInPandas`` over payload batches producing
  fixed-shape feature vectors + width/height metadata; the inner
  pixel decode is the stub boundary (swap in PIL/librosa in prod).
* sample_frames — frame-sampling plan for video refs: emits
  ``(doc_id, media_idx, frame_no)`` rows for every Nth frame without
  decoding (pure expressions), the standard pre-shuffle before a
  decode stage so frames of one video spread across executors.
"""

from __future__ import annotations

import hashlib
import typing

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "webm": "video",
}


def extract_media_refs(docs: DataFrame) -> DataFrame:
    """Explode media spans; infer a coarse type from the ref suffix."""
    media = F.filter(F.col("spans"), lambda s: s["kind"] == "media")
    ex = docs.select(
        "doc_id", F.posexplode(media).alias("media_idx", "span")
    ).select("doc_id", "media_idx", F.col("span.media_ref").alias("media_ref"))
    suffix = F.lower(F.substring_index(F.col("media_ref"), ".", -1))
    mapping = F.create_map(
        *[x for k, v in MEDIA_TYPES.items() for x in (F.lit(k), F.lit(v))]
    )
    return ex.withColumn(
        "media_type", F.coalesce(F.try_element_at(mapping, suffix), F.lit("binary"))
    )


def fetch_payloads(refs: DataFrame, fake: bool = True) -> DataFrame:
    """Attach ``payload: binary``.  Real fetch is per-partition I/O;
    the fake substitutes deterministic bytes (sha256 stream of the ref)."""
    if not fake:
        raise NotImplementedError(
            "object-storage fetch not available in this container; "
            "use fake=True for the deterministic test payload"
        )

    @F.pandas_udf(T.BinaryType())
    def fake_fetch(ref: pd.Series) -> pd.Series:
        def one(r: str) -> bytes:
            h = hashlib.sha256(r.encode()).digest()
            return (h * 8)[:256]  # 256 deterministic bytes per ref

        return ref.map(one)

    return refs.withColumn("payload", fake_fetch(F.col("media_ref")))


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_idx", T.IntegerType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_features(
    payloads: DataFrame, dim: int = 16, fake: bool = True
) -> DataFrame:
    """``mapInPandas`` decode -> fixed-dim feature vector + metadata.

    The Arrow batch shape (binary column in, array<float> out) and the
    partition-parallel execution are real; only the pixel/sample decode
    inside ``_decode_one`` is stubbed (deterministic pseudo-decode from
    the payload bytes when ``fake``)."""
    if not fake:
        raise NotImplementedError("image/audio codecs not in this container")

    def gen(batches: typing.Iterator[pd.DataFrame]) -> typing.Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, widths, heights = [], [], []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
                # stub "decode": fold bytes into a dim-length mean-pooled vector
                vec = arr[: (len(arr) // dim) * dim].reshape(-1, dim).mean(axis=0)
                feats.append((vec / 255.0).tolist())
                widths.append(int(arr[0]) + 1)
                heights.append(int(arr[1]) + 1)
            out = pdf[["doc_id", "media_idx", "media_type"]].copy()
            out["width"] = widths
            out["height"] = heights
            out["feature"] = feats
            yield out

    return payloads.mapInPandas(gen, FEATURE_SCHEMA)


def sample_frames(
    refs: DataFrame, every_n: int = 30, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling plan for video refs (no decode): one row per
    sampled frame, ready to repartition before the decode stage."""
    videos = refs.filter(F.col("media_type") == "video")
    # frame count is metadata in prod; stub: deterministic from the ref
    n_frames = (F.abs(F.xxhash64("media_ref")) % 900 + 100).cast("int")
    frames = F.slice(
        F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)), 1, max_frames
    )
    return videos.select(
        "doc_id", "media_idx", "media_ref", F.explode(frames).alias("frame_no")
    )
