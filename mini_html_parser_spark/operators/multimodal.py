"""Multimodal column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct.  Decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages; the actual codec call is
STUBBED (no image/audio libs in this container) behind
``try-import`` with a deterministic fake, but the Spark-side plumbing
— schema, batch shape, UDF signature, partitioning neutrality — is
real and tested.
"""

from __future__ import annotations


from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_ref", StringType()),
    StructField("byte_len", LongType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames_sampled", IntegerType()),
])


def attach_media_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stand-in opaque payload: the utf-8 bytes of the text column plus
    a media_ref; on a real corpus this column comes from the lakehouse."""
    return df.select(
        F.col(id_col),
        F.concat(F.lit("media://blob/"), F.col(id_col).cast("string")).alias("media_ref"),
        F.encode(F.col(text_col), "utf-8").cast(BinaryType()).alias("payload"),
    )


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode — STUB for the real codec call.

    A real deployment swaps this for PIL/ffmpeg behind the same
    signature; until then the fake is used unconditionally (even if an
    image lib happens to be importable) so the operator's output is
    stable and reproducible everywhere.
    """
    n = len(payload or b"")
    return {
        "format": ["png", "jpeg", "webp"][n % 3],
        "width": 64 + (n % 97) * 4,
        "height": 64 + (n * 7 % 89) * 4,
        "n_frames_sampled": 1 + n % 8,
    }


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_ref", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("resized_payload", BinaryType()),
])


def resize_media(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stage (mapInPandas).  The actual pixel work is STUBBED
    (no image libs in this container): the fake preserves aspect ratio
    from the deterministic decoded dims and emits a truncated payload
    whose length tracks the area ratio — the Spark-side contract
    (schema, batch shape, binary in/out) is real and tested."""
    from .multimodal import _decode_stub  # self-import keeps pickling simple

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, payloads = [], [], []
            for p in pdf["payload"]:
                meta = _decode_stub(p)
                w, h = meta["width"], meta["height"]
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                ws.append(nw)
                hs.append(nh)
                n = len(p or b"")
                keep = max(1, int(n * (nw * nh) / (w * h))) if n else 0
                payloads.append((p or b"")[:keep])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_ref": pdf["media_ref"],
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
                "resized_payload": payloads,
            })

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_ref", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_payload", BinaryType()),
])


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage (mapInPandas): one output row per sampled
    frame, frames taken at evenly spaced offsets of the payload (the
    stub analogue of evenly spaced video timestamps).  Emitting
    multiple rows per input row exercises the 1→N mapInPandas shape a
    real ffmpeg-backed sampler needs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "frame_idx": [], "frame_payload": []}
            for doc_id, ref, p in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
                b = p or b""
                k = min(n_frames, max(1, len(b)))
                step = max(1, len(b) // k) if b else 1
                for i in range(k):
                    out["doc_id"].append(int(doc_id))
                    out["media_ref"].append(ref)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(b[i * step:i * step + 16])
            yield pd.DataFrame({
                "doc_id": pd.array(out["doc_id"], dtype="int64"),
                "media_ref": out["media_ref"],
                "frame_idx": pd.array(out["frame_idx"], dtype="int32"),
                "frame_payload": out["frame_payload"],
            })

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode/feature stage over the binary payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_ref": pdf["media_ref"],
                "byte_len": pdf["payload"].map(lambda b: len(b or b"")).astype("int64"),
                "format": [f["format"] for f in feats],
                "width": pd.array([f["width"] for f in feats], dtype="int32"),
                "height": pd.array([f["height"] for f in feats], dtype="int32"),
                "n_frames_sampled": pd.array(
                    [f["n_frames_sampled"] for f in feats], dtype="int32"
                ),
            })

    return media.mapInPandas(run, schema=MEDIA_FEATURES_SCHEMA)


def media_text_pairs(
    df: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    text_kinds: tuple[str, ...] = ("text", "html"),
    media_kind: str = "media",
) -> DataFrame:
    """Image-text pair mining from interleaved documents — the
    OBELICS / MMC4 construction: for every media span, the nearest
    PRECEDING and FOLLOWING text spans in document order, i.e. the
    caption candidates a multimodal pretraining pipeline pairs each
    image with.

    Input is the engine's interleaved contract
    ``spans array<struct<kind,text,media_ref,offset>>``; output is
    one row per media span:
    ``(id_col, media_ref, offset, prev_text, next_text)`` with nulls
    at document edges.

    Shape: one posexplode (no shuffle) + ONE window exchange per doc;
    both context columns come from the same (partition, order) spec —
    ``last(…, ignorenulls)`` over the preceding frame and
    ``first(…, ignorenulls)`` over the following frame — so Catalyst
    plans a single sort+window stage.  At 100 TB this is
    embarrassingly parallel per document.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col), F.posexplode(spans_col).alias("pos", "_s")
    ).select(
        id_col,
        "pos",
        F.col("_s.kind").alias("kind"),
        F.col("_s.text").alias("text"),
        F.col("_s.media_ref").alias("media_ref"),
        F.col("_s.offset").alias("offset"),
    )
    text_val = F.when(F.col("kind").isin(*text_kinds), F.col("text"))
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_w = w.rowsBetween(Window.unboundedPreceding, -1)
    next_w = w.rowsBetween(1, Window.unboundedFollowing)
    out = base.withColumn(
        "prev_text", F.last(text_val, ignorenulls=True).over(prev_w)
    ).withColumn(
        "next_text", F.first(text_val, ignorenulls=True).over(next_w)
    )
    return out.filter(F.col("kind") == media_kind).select(
        id_col, "media_ref", "offset", "prev_text", "next_text"
    )
