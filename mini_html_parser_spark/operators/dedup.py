"""Deduplication operators (training-data pipeline additions).

Exact and near-duplicate detection over a ``(doc_id, text)`` corpus.
Everything except the simhash bit-twiddling is built-in-function
JVM-side work; candidate generation always goes through banding/
bucketing so no stage is O(n²) at corpus scale — the only pairwise
work happens inside a bucket (LSH guarantee), which is the published
MinHash-LSH construction (shingle → minhash → band → bucket-join).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType


# ---- exact dedup -----------------------------------------------------------

def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per duplicated content hash
    with the surviving (min) id and the duplicate count."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Survivors only: first id per content hash (deterministic)."""
    w = df.withColumn("content_hash", F.md5(F.col(text_col)))
    keep = w.groupBy("content_hash").agg(F.min(id_col).alias(id_col))
    return w.join(keep, [id_col, "content_hash"], "left_semi").drop("content_hash")


# ---- MinHash + LSH ----------------------------------------------------------

def shingles(text: F.Column, n: int = 3) -> F.Column:
    """Word n-gram shingle set (distinct) as array<string>."""
    toks = F.split(F.trim(text), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def minhash_signature(sh: F.Column, num_hashes: int = 32) -> F.Column:
    """k-permutation minhash via seeded xxhash64 — pure JVM expression."""
    return F.array(*[
        F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ])


def shingle_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sh) shingle-set frame.  Callers that feed both the LSH
    candidate stage and the Jaccard verify stage should .persist()
    this — the shingle expression otherwise re-evaluates once per
    join branch (4× on the full dedup pipeline, measured)."""
    return df.select(F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh"))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: same minhash band bucket.

    rows/band = num_hashes/bands; a pair colliding in ANY band is a
    candidate.  Output: (id_a, id_b) with id_a < id_b, distinct.
    The bucket join shuffles on (band, band_hash) — uniform by
    construction, so no skew handling needed beyond AQE.
    """
    rows_per_band = num_hashes // bands
    # materialize the shingle array once; computing the signature from
    # the inline shingle expression would re-evaluate the split/
    # sequence/distinct chain inside every one of the k hash lambdas
    sh = shingle_df if shingle_df is not None else shingle_frame(df, text_col, id_col, shingle_n)
    sig = sh.select(F.col(id_col), minhash_signature(F.col("sh"), num_hashes).alias("sig"))
    banded = sig.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.concat_ws("_", *[
                            F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ])
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only (never O(n²))."""
    sh = shingle_df if shingle_df is not None else shingle_frame(df, text_col, id_col, shingle_n)
    a = sh.alias("a")
    b = sh.alias("b")
    joined = (
        candidates.join(a, candidates.id_a == F.col(f"a.{id_col}"))
        .join(b, candidates.id_b == F.col(f"b.{id_col}"))
        .select(
            "id_a", "id_b",
            (
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh"))
            ).alias("jaccard"),
        )
    )
    return joined.filter(F.col("jaccard") >= threshold)


# ---- SimHash -----------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit simhash per document.

    Token hashing + bit-vote accumulation is done with numpy inside an
    Arrow-batched pandas UDF (64-wide bit expressions would bloat
    codegen); banding/bucketing stays JVM-side.
    """
    import numpy as np

    @F.pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").split()
            if not toks:
                out.append(0)
                continue
            hs = np.array(
                [hash_token(tok) for tok in toks], dtype=np.uint64
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for i in range(64):
                if votes[i] > 0:
                    sig |= np.uint64(1) << np.uint64(i)
            out.append(int(sig.astype(np.int64)))
        return pd.Series(out, dtype="int64")

    return df.withColumn("simhash", _simhash(F.col(text_col)))


def hash_token(tok: str) -> int:
    """Deterministic 64-bit FNV-1a (stable across workers, unlike
    Python's salted ``hash``)."""
    h = 0xCBF29CE484222325
    for b in tok.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_candidates(df_with_sig: DataFrame, id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates by the 4×16-bit block trick: any pair with
    hamming ≤ 3 must agree on at least one 16-bit block (pigeonhole),
    so bucket by each block and verify hamming inside buckets."""
    blocks = df_with_sig.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("block"),
                F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
            ) for b in range(4)
        ])).alias("bl"),
    ).select(id_col, "simhash", "bl.block", "bl.val")
    l, r = blocks.alias("l"), blocks.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.block") == F.col("r.block"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
