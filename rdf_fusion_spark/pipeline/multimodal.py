"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched Pandas stages.

The Spark-side machinery here is real and tested: schemas, batch iteration
via mapInPandas (Arrow transfer, vectorized, no per-row Python), partition
sizing by byte budget. The actual media decoding is STUBBED — the runtime
has no image/audio libraries — behind `register_decoder`, with a
deterministic fake used by tests. Swap in PIL/torchaudio/ffmpeg decoders in
production; the Spark plumbing does not change.

At 100 TB: binary payloads dominate row size, so `repartition_by_bytes`
targets a per-partition byte budget (not row count) to keep Arrow batches
and executor memory bounded; decode stages are mapInPandas so each
partition streams batches instead of materializing.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("payload", T.BinaryType(), True),      # opaque encoded bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),       # images/video
    T.StructField("height", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),  # audio
    T.StructField("duration_ms", T.LongType(), True),     # audio/video
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])

Decoder = Callable[[bytes, str], Optional[list]]

_DECODERS: dict[str, Decoder] = {}


def register_decoder(kind: str, fn: Decoder) -> None:
    """Install a decoder (payload bytes, mime) -> feature vector | None."""
    _DECODERS[kind] = fn


def _default_decoder(payload: bytes, mime: str) -> Optional[list]:
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in this "
        "runtime; register_decoder() a real implementation (PIL, torchaudio, "
        "ffmpeg) or the deterministic fake from tests"
    )


def deterministic_fake_decoder(payload: bytes, mime: str) -> Optional[list]:
    """Test decoder: 4 deterministic moments of the raw bytes."""
    if payload is None or len(payload) == 0:
        return None
    n = float(len(payload))
    s = sum(payload)
    return [n, s / n, float(payload[0]), float(payload[-1])]


def repartition_by_bytes(df: DataFrame, target_bytes: int = 64 << 20,
                         payload_col: str = "payload") -> DataFrame:
    """Repartition so each partition holds ~target_bytes of payload.

    Row-count partitioning fails when payload sizes vary by 1000×; this
    sizes by bytes using a cheap pre-agg (sum of lengths), which is exact
    enough to bound executor memory.
    """
    total = (df.select(F.sum(F.length(F.col(payload_col))).alias("b"))
             .head()[0]) or 0
    n = max(1, int(total // target_bytes) + 1)
    return df.repartition(n)


def extract_features(df: DataFrame, batch_decoder: Optional[Decoder] = None
                     ) -> DataFrame:
    """Decode/feature-extract media rows via mapInPandas (Arrow batches).

    The decoder runs per element inside a pandas batch — vectorize inside
    the decoder if the underlying library supports it.
    """
    decoders = dict(_DECODERS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind, mime in zip(pdf["payload"], pdf["kind"],
                                           pdf["mime"]):
                fn = batch_decoder or decoders.get(kind, _default_decoder)
                feats.append(fn(payload, mime))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda b: len(b) if b is not None else None),
                "feature": feats,
            })

    # ship ONLY the columns the function reads across the Arrow boundary:
    # Spark cannot see inside mapInPandas, so an un-projected frame would
    # serialize (and read from storage) every column (guide §4.1)
    return df.select("media_id", "kind", "mime", "payload") \
        .mapInPandas(run, schema=FEATURE_SCHEMA)


Resizer = Callable[[bytes, str, int, int], Optional[bytes]]


def _default_resizer(payload: bytes, mime: str, w: int, h: int
                     ) -> Optional[bytes]:
    raise NotImplementedError(
        "image resizing requires an image library not present in this "
        "runtime; pass a real resizer (PIL.Image.resize + re-encode) or "
        "the deterministic fake from tests"
    )


def deterministic_fake_resizer(payload: bytes, mime: str, w: int, h: int
                               ) -> Optional[bytes]:
    """Test resizer: deterministically scales the byte stream to w*h bytes
    (repeat-truncate) — stands in for decode→resize→re-encode."""
    if payload is None or len(payload) == 0:
        return None
    target = max(1, w * h)
    reps = target // len(payload) + 1
    return (payload * reps)[:target]


def resize_images(df: DataFrame, width: int, height: int,
                  resizer: Optional[Resizer] = None) -> DataFrame:
    """Resize image payloads to (width, height) via mapInPandas.

    Returns MEDIA_SCHEMA rows with the payload replaced by the re-encoded
    bytes and width/height metadata updated; non-image rows pass through
    unchanged. Arrow-batched; combine with repartition_by_bytes upstream
    so decode memory stays bounded per partition.
    """
    rs = resizer or _default_resizer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            is_img = out["kind"] == "image"
            resized = [
                rs(p, m, width, height)
                for p, m in zip(out.loc[is_img, "payload"],
                                out.loc[is_img, "mime"])]
            out.loc[is_img, "payload"] = resized
            # only claim the new dimensions where the resize actually
            # produced bytes; a failed/empty payload keeps NULL metadata
            ok_idx = [i for i, r in zip(out.index[is_img], resized)
                      if r is not None]
            out.loc[ok_idx, "width"] = width
            out.loc[ok_idx, "height"] = height
            bad_idx = [i for i, r in zip(out.index[is_img], resized)
                       if r is None]
            out.loc[bad_idx, "width"] = None
            out.loc[bad_idx, "height"] = None
            yield out

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms) to
    decode — the schedule is computed relationally (explode over a
    sequence), only the decode of scheduled frames would hit the stub."""
    ts = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
    return (df.where(F.col("kind") == "video")
            .select("media_id", F.explode(ts).alias("frame_ts_ms")))
