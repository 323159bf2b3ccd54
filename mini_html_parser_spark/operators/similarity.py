"""Similarity search over an embedding column (array<float>).

Two paths:

* brute-force cosine top-k — the exact baseline; one scan, one
  TakeOrderedAndProject, all arithmetic in built-in higher-order
  functions (zip_with/aggregate) so it whole-stage-codegens;
* LSH-bucketed ANN (random hyperplanes) — the scale path: sign-bit
  bucket per document, exact cosine only within the query's bucket
  (probe neighbors by flipping bits for recall).
"""

from __future__ import annotations

import math
import struct as _struct

# module-level so pandas_udf type hints (stringified by the future
# import) resolve against module globals
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_col(a: F.Column, b: F.Column) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col).cast("array<double>"), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


# ---- random-hyperplane LSH ---------------------------------------------------

def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random plane component in [-1, 1] from a
    splitmix64-style avalanche of (plane, dim) — no RNG state."""
    x = (plane * 0x9E3779B97F4A7C15 + dim * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    return (x / 2**64) * 2.0 - 1.0


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    return [[_plane_component(p, d) for d in range(dim)] for p in range(n_planes)]


# above this many inlined literals (n_planes × dim), the codegen
# literal path stops being free: the plan string, analysis time and
# generated code all grow with it (at dim=768 × 12 planes ≈ 9k literal
# expressions per plan).  Past the budget, bucket assignment switches
# to ONE numpy sign(V·Pᵀ) per Arrow batch against a plane matrix
# shipped once per stage (VERDICT r2 #4).
LSH_LITERAL_BUDGET = 1024


def _lsh_bucket_udf(planes: list[list[float]]):
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64).T  # dim × n_planes
    weights = 1 << np.arange(len(planes), dtype=np.int64)

    @pandas_udf("int")
    def bucket(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype="int32")
        arr = v.to_numpy()
        # null vectors bucket to 0 — the literal path's semantics
        # (every when(null >= 0) bit evaluates to its otherwise(0)),
        # and np.stack would crash on a None row
        mask = np.fromiter((x is not None for x in arr), dtype=bool, count=len(arr))
        out = np.zeros(len(arr), dtype=np.int32)
        if mask.any():
            M = np.stack(arr[mask])          # non-null batch × dim
            bits = (M @ P) >= 0              # batch × n_planes
            out[mask] = (bits @ weights).astype(np.int32)
        return pd.Series(out)

    return bucket


def lsh_bucket_col(
    vec: F.Column, planes: list[list[float]], use_udf: bool | None = None
) -> F.Column:
    """Sign-bit LSH bucket id.  Small plane tables inline as codegen
    literal expressions (zero Python in the plan); large ones
    (``n_planes × dim > LSH_LITERAL_BUDGET``, or ``use_udf=True``)
    use the Arrow-batched matmul UDF — same buckets, constant plan
    size.  (Sign parity between the two is exact except for dots
    within float-association distance of 0, which no LSH guarantee
    depends on.)"""
    if use_udf is None:
        use_udf = len(planes) * len(planes[0]) > LSH_LITERAL_BUDGET
    if use_udf:
        return _lsh_bucket_udf(planes)(vec)
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(c) for c in plane])) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: restrict exact cosine to buckets within
    ``probe_hamming`` bit flips of the query's bucket (multi-probe —
    any radius; radius 2 probes 1 + n + n(n−1)/2 buckets)."""
    from itertools import combinations

    dim = len(query_vec)
    planes = hyperplanes(n_planes, dim)
    q_bucket = 0
    for i, plane in enumerate(planes):
        if sum(px * qx for px, qx in zip(plane, query_vec)) >= 0:
            q_bucket |= 1 << i
    probe = {q_bucket}
    for h in range(1, probe_hamming + 1):
        for flips in combinations(range(n_planes), h):
            mask = 0
            for i in flips:
                mask |= 1 << i
            probe.add(q_bucket ^ mask)

    vec = F.col(vec_col).cast("array<double>")
    bucketed = df.withColumn("bucket", lsh_bucket_col(vec, planes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = bucketed.filter(F.col("bucket").isin(sorted(probe))).select(
        F.col(id_col),
        F.round(cosine_col(vec, q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


# ---- IVF (inverted-file) ANN -------------------------------------------------

def ivf_index(
    df: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    train_fraction: float | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: k-means centroids + per-vector list
    assignment (the FAISS ``IndexIVFFlat`` construction, Spark-native).

    Training runs on a sample (``train_fraction``) — at corpus scale
    k-means on a 0.1% sample is standard; assignment is one full scan
    through the fitted model (JVM).  Returns ``(assigned, centroids)``
    where ``assigned`` adds a ``list_id`` column.  For repeated query
    serving, write ``assigned`` partitioned by ``list_id`` so a probe
    reads only its lists' files (partition pruning).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn(
        "_features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    train = feat.sample(False, train_fraction, seed) if train_fraction else feat
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=20, featuresCol="_features"
    ).fit(train.select("_features"))
    assigned = (
        model.transform(feat)
        .withColumnRenamed("prediction", "list_id")
        .drop("_features")
    )
    return assigned, [[float(x) for x in c] for c in model.clusterCenters()]


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    train_fraction: float | None = None,
) -> DataFrame:
    """IVF ANN top-k: exact cosine only inside the ``n_probe`` lists
    whose centroids are nearest the query (driver-side arithmetic on
    the tiny centroid table).  Identical vectors always share the
    query's own list, so planted duplicates are guaranteed recalled —
    the basis of the driver oracle."""
    assigned, centers = ivf_index(
        df, n_centroids, vec_col, id_col, seed, train_fraction
    )
    dists = sorted(
        range(len(centers)),
        key=lambda i: sum((q - c) ** 2 for q, c in zip(query_vec, centers[i])),
    )
    probe = dists[:n_probe]
    vec = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = assigned.filter(F.col("list_id").isin(probe)).select(
        F.col(id_col),
        F.round(cosine_col(vec, q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH bucket self-join —
    exact cosine computed only inside buckets (never O(n²)); buckets
    above dedup.MAX_BUCKET_PAIRS_SIZE emit representative→member star
    edges instead of all pairs (mass-duplicated embeddings would
    otherwise make one bucket quadratic — see operators/dedup.py)."""
    from .dedup import _bucket_pairs

    first = df.select(F.col(vec_col)).first()
    if first is None:
        return df.sparkSession.createDataFrame([], "id_a long, id_b long, cosine double")
    dim = len(first[0])
    planes = hyperplanes(n_planes, dim)
    vec = F.col(vec_col).cast("array<double>")
    b = df.select(F.col(id_col), vec.alias("v")).withColumn(
        "bucket", lsh_bucket_col(F.col("v"), planes)
    )
    b = b.persist()  # the join shape re-reads the bucketed frame per branch
    pairs = _bucket_pairs(
        b, ["bucket"], id_col, carry_cols=["v"], dedupe=False, heavy_carry=True
    ).select(
        "id_a", "id_b",
        F.round(cosine_col(F.col("v_a"), F.col("v_b")), 6).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: str = "seeded",
    kmeans_sample: int = 20_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): partition the
    embedding space into ``k`` clusters, then inside each cluster drop
    every vector that has a more-senior (lower-``id_col``) cluster-mate
    with cosine ≥ ``threshold``.  Near-duplicate *meaning* — paraphrase
    mirrors, templated boilerplate — that exact/MinHash text dedup
    can't see.

    Returns one row per input vector: ``(id, cluster_id, keep)``.

    ``centroids='seeded'`` uses the ``k`` lowest-id vectors as fixed
    centroids — fully deterministic and reproducible in ANSI SQL (the
    DuckDB oracle re-derives the identical clustering).
    ``centroids='kmeans'`` trains real centroids with the module's
    deterministic Lloyd iteration on a bounded driver-side sample
    (the paper's construction; not SQL-expressible).

    Scale shape (100 TB): the centroid table is ``k`` rows broadcast
    against the corpus (k ~ 10⁴–10⁵ in the paper — still MBs);
    assignment is one windowed argmax per vector, no corpus shuffle
    beyond the one join that emits intra-cluster pairs.  Pairs are
    ALWAYS exact all-pairs within a cluster (``max_bucket_size=None``
    — no star-edge fallback): pairwise comparison IS the SemDeDup
    semantics, so a silent star degradation above 128 members would
    change results, not just recall (junior-junior near-duplicate
    pairs would never be tested; cosine is not transitive).  The
    quadratic-control knob is ``k`` itself — the paper sizes k so
    clusters stay ~10⁴ vectors and does exactly this full pairwise
    pass inside each cluster.
    """
    from .dedup import _bucket_pairs

    vec = F.col(vec_col).cast("array<double>")
    spark = df.sparkSession
    if centroids == "seeded":
        cent = (
            df.orderBy(id_col)
            .limit(k)
            .select(F.col(id_col).alias("cluster_id"), vec.alias("cvec"))
        )
    elif centroids == "kmeans":
        import numpy as np

        sample = (
            df.orderBy(id_col)
            .limit(kmeans_sample)
            .select(vec.alias("v"))
            .collect()
        )
        X = _normalize_rows(np.array([r["v"] for r in sample], dtype=np.float64))
        C = _lloyd(X, k, seed=13)
        cent = spark.createDataFrame(
            [(int(i), [float(x) for x in c]) for i, c in enumerate(C)],
            "cluster_id long, cvec array<double>",
        )
    else:  # pragma: no cover - guarded API
        raise ValueError(f"centroids must be 'seeded' or 'kmeans': {centroids!r}")

    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("c_cos"), F.asc("cluster_id")
    )
    assigned = (
        df.select(F.col(id_col), vec.alias("v"))
        .crossJoin(F.broadcast(cent))
        .withColumn("c_cos", F.round(cosine_col(F.col("v"), F.col("cvec")), 6))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "cluster_id", "v")
    )
    assigned = assigned.persist()  # pair emission re-reads per join branch
    dup_ids = (
        _bucket_pairs(
            assigned, ["cluster_id"], id_col,
            carry_cols=["v"], dedupe=False, heavy_carry=True,
            max_bucket_size=None,
        )
        .withColumn("cos", F.round(cosine_col(F.col("v_a"), F.col("v_b")), 6))
        .filter(F.col("cos") >= threshold)
        .select(F.col("id_b").alias(id_col))
    )
    return (
        assigned.join(dup_ids.distinct().withColumn("_dup", F.lit(True)),
                      on=id_col, how="left")
        .select(
            id_col,
            "cluster_id",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


# ---- Product quantization (PQ) ANN -------------------------------------------
# The FAISS IndexPQ construction, Spark-native: vectors are L2-
# normalized (so L2 order ⇔ cosine order), split into m subvectors,
# each quantized to one of k centroids learned by deterministic
# k-means on a driver-side sample.  A corpus vector becomes m bytes —
# 1024-dim float32 → 8 bytes is the compression that makes
# billion-scale ANN fit in memory — and a query scans codes with an
# asymmetric-distance (ADC) lookup table, never touching the original
# vectors.

def _lloyd(X, k: int, seed: int, iters: int = 25):
    """Deterministic numpy k-means (seeded init, fixed iteration
    count, empty clusters keep their previous centroid)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(X))[:k]
    C = X[idx].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def _normalize_rows(M):
    import numpy as np

    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return M / norms


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_n: int = 2048,
    seed: int = 7,
):
    """Train PQ codebooks on a deterministic sample (md5-ordered, like
    sample_exact_n — resumable/replayable).  Returns a numpy array of
    shape (m, k, dim/m).  dim must divide evenly by m."""
    import numpy as np

    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#pq{seed}")))
    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias("v"), key.alias("k"))
        .orderBy("k")
        .limit(sample_n)
        .collect()
    )
    X = _normalize_rows(np.asarray([r["v"] for r in rows], dtype=np.float64))
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack(
        [_lloyd(X[:, j * dsub : (j + 1) * dsub], k, seed + j) for j in range(m)]
    )


def pq_encode(
    df: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode each vector to m uint8 codes (a BinaryType column of m
    bytes).  Arrow-batched: one numpy distance computation per batch
    per subspace — no per-row Python."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(codebooks)  # m × k × dsub
    m, _k, dsub = C.shape

    @pandas_udf("binary")
    def encode(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=object)
        M = _normalize_rows(np.stack(v.to_numpy()).astype(np.float64))
        codes = np.empty((len(M), m), dtype=np.uint8)
        for j in range(m):
            block = M[:, j * dsub : (j + 1) * dsub]
            d = ((block[:, None, :] - C[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d.argmin(axis=1)
        return pd.Series([c.tobytes() for c in codes])

    return df.select(
        F.col(id_col), encode(F.col(vec_col).cast("array<double>")).alias("pq_codes")
    )


def pq_topk(
    df: DataFrame,
    codebooks,
    query_vec: list,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: the query builds an (m × k) lookup table of
    sub-distances to every centroid; each corpus vector's distance is
    m table lookups summed — the scan reads only the m-byte codes.
    TakeOrderedAndProject keeps the result driver-side tiny."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(codebooks)
    m, _kk, dsub = C.shape
    q = _normalize_rows(np.asarray([query_vec], dtype=np.float64))[0]
    lut = np.stack(
        [((C[j] - q[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1) for j in range(m)]
    )  # m × k

    @pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        if codes.empty:
            return pd.Series([], dtype=np.float64)
        B = np.stack([np.frombuffer(b, dtype=np.uint8) for b in codes.to_numpy()])
        return pd.Series(lut[np.arange(m)[None, :], B].sum(axis=1))

    encoded = pq_encode(df, C, vec_col, id_col)
    return (
        encoded.select(id_col, F.round(adc("pq_codes"), 9).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


# ---- IVF-PQ (pruned lists × compressed codes) --------------------------------
# ---- scalar (int8) quantization ------------------------------------------

def sq8_encode(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization (FAISS
    ScalarQuantizer QT_8bit shape): ``codes = round(x / scale)`` with
    ``scale = max|x| / 127`` — 4× less embedding I/O than float32 at
    ~1e-5 cosine error, the compression tier a 100-TB embedding table
    ships to its scorer when PQ's lossier 8-32× is too coarse.  Pure
    JVM expressions; the scale is PROJECTED to a real column before
    the transform that references it — Catalyst does not CSE inside
    lambda functions, an inline scale would re-evaluate array_max per
    element (CLAUDE.md / decontam.ngrams_of_tokens).  All-zero vectors
    take scale 1 (codes all zero) rather than dividing by zero.

    Returns ``(id, sq_scale double, sq_codes array<tinyint>)``."""
    v = F.col(vec_col).cast("array<double>")
    raw = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    staged = df.select(
        F.col(id_col),
        v.alias("_v"),
        F.when(raw > 0, raw).otherwise(F.lit(1.0)).alias("sq_scale"),
    )
    return staged.select(
        id_col,
        "sq_scale",
        F.transform(
            F.col("_v"),
            lambda x: F.round(x / F.col("sq_scale")).cast("tinyint"),
        ).alias("sq_codes"),
    )


def sq8_topk(
    codes_df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Cosine top-k over int8 codes against a FLOAT query (asymmetric
    distance: the query is never quantized).  The per-vector scale
    cancels out of the cosine — scoring needs only ``sq_codes``, so
    the scan reads a quarter of the float path's bytes and stays
    entirely inside whole-stage codegen (zip_with/aggregate, no
    Python, no shuffle below the final TakeOrderedAndProject)."""
    import math

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    c = F.col("sq_codes")
    dot = F.aggregate(
        F.zip_with(c, q, lambda ci, qi: ci.cast("double") * qi),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cn = F.sqrt(
        F.aggregate(
            F.transform(c, lambda ci: ci.cast("double") * ci.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = codes_df.select(
        F.col(id_col),
        F.round(
            dot / F.when(cn > 0, cn).otherwise(F.lit(1.0)) / F.lit(qn), 6
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


# The FAISS IndexIVFPQ composition, Spark-native: the IVF coarse
# quantizer prunes which lists a query scans, and inside each list the
# vectors are stored as m-byte PQ codes of their RESIDUAL to the list
# centroid (residuals are tighter than raw vectors, so the same
# codebook budget quantizes them with far less error).  At 100 TB this
# is the ANN shape that works: n_probe/n_centroids of the corpus
# scanned × dim·4/m bytes per vector touched — pruning and compression
# multiply rather than choosing one.


def unit_rows(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, _nv) with ``_nv`` the L2-normalized vector (zero vectors
    pass through), so downstream L2 order ⇔ cosine order.  The norm is
    projected to a REAL column before the transform lambda references
    it — Catalyst does not CSE inside lambdas, an inline _norm would
    re-aggregate the whole vector per element (the 17× decontaminate
    lesson, CLAUDE.md)."""
    v = F.col(vec_col).cast("array<double>")
    withn = df.select(F.col(id_col), v.alias("_v")).withColumn(
        "_n", _norm(F.col("_v"))
    )
    return withn.select(
        id_col,
        F.transform(
            "_v",
            lambda x: x / F.when(F.col("_n") > 0, F.col("_n")).otherwise(F.lit(1.0)),
        ).alias("_nv"),
    )


def ivfpq_index(
    df: DataFrame,
    n_centroids: int = 16,
    m: int = 4,
    k_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    sample_n: int = 2048,
    train_fraction: float | None = None,
):
    """Build the IVF-PQ index: returns ``(encoded, centers, codebooks)``
    where ``encoded`` is ``(id_col, list_id, pq_codes binary)``,
    ``centers`` the unit-space IVF centroids (numpy n_centroids × dim)
    and ``codebooks`` the residual PQ codebooks (numpy m × k × dim/m).

    Training is driver-side on deterministic samples (MLlib k-means on
    ``train_fraction`` for the coarse quantizer; md5-ordered
    ``sample_n`` rows for the residual codebooks — the same
    TakeOrderedAndProject shape as pq_train, no full sort).  Encoding
    is one Arrow-batched pass: residual = unit vector − its list
    centroid, then per-subspace argmin — no per-row Python."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    unit = unit_rows(df, vec_col, id_col)
    assigned, centers = ivf_index(
        unit, n_centroids, vec_col="_nv", id_col=id_col, seed=seed,
        train_fraction=train_fraction,
    )
    centers_np = np.asarray(centers, dtype=np.float64)

    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#ivfpq{seed}")))
    rows = (
        assigned.select(F.col("_nv").alias("v"), "list_id", key.alias("k"))
        .orderBy("k")
        .limit(sample_n)
        .collect()
    )
    X = np.asarray([r["v"] for r in rows], dtype=np.float64)
    R = X - centers_np[np.asarray([r["list_id"] for r in rows])]
    dim = R.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    codebooks = np.stack(
        [_lloyd(R[:, j * dsub : (j + 1) * dsub], k_codes, seed + j) for j in range(m)]
    )

    C = codebooks

    @pandas_udf("binary")
    def encode(v: pd.Series, lid: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=object)
        M = np.stack(v.to_numpy()).astype(np.float64)
        M -= centers_np[lid.to_numpy()]
        codes = np.empty((len(M), m), dtype=np.uint8)
        for j in range(m):
            block = M[:, j * dsub : (j + 1) * dsub]
            d = ((block[:, None, :] - C[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d.argmin(axis=1)
        return pd.Series([c.tobytes() for c in codes])

    encoded = assigned.select(
        F.col(id_col),
        F.col("list_id"),
        encode(F.col("_nv"), F.col("list_id")).alias("pq_codes"),
    )
    return encoded, centers_np, codebooks


def ivfpq_topk(
    df: DataFrame,
    query_vec: list,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    m: int = 4,
    k_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    sample_n: int = 2048,
    train_fraction: float | None = None,
) -> DataFrame:
    """IVF-PQ ANN top-k: probe the ``n_probe`` lists nearest the
    query, ADC-scan only their m-byte codes with a PER-LIST lookup
    table built from the query's residual to that list's centroid.
    The scan never touches an original vector; pruning (lists) and
    compression (codes) compose.  Identical planted vectors share the
    query's list and its exact code, so their ADC distance is that
    list's floor — the basis of the driver oracle."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    encoded, centers_np, codebooks = ivfpq_index(
        df, n_centroids, m, k_codes, vec_col, id_col, seed, sample_n,
        train_fraction,
    )
    dim = centers_np.shape[1]
    dsub = dim // m
    q = _normalize_rows(np.asarray([query_vec], dtype=np.float64))[0]
    d2 = ((centers_np - q) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d2, kind="stable")[:n_probe]]

    # per-probed-list ADC tables, gathered by list_id inside the UDF
    luts = np.zeros((len(centers_np), m, codebooks.shape[1]), dtype=np.float64)
    for L in probe:
        qr = q - centers_np[L]
        luts[L] = np.stack(
            [
                ((codebooks[j] - qr[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)
                for j in range(m)
            ]
        )

    @pandas_udf("double")
    def adc(codes: pd.Series, lid: pd.Series) -> pd.Series:
        if codes.empty:
            return pd.Series([], dtype=np.float64)
        B = np.stack([np.frombuffer(b, dtype=np.uint8) for b in codes.to_numpy()])
        L = lid.to_numpy()
        return pd.Series(
            luts[L[:, None], np.arange(m)[None, :], B].sum(axis=1)
        )

    return (
        encoded.filter(F.col("list_id").isin(probe))
        .select(id_col, F.round(adc("pq_codes", "list_id"), 9).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def batch_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for a BATCH of query vectors in ONE corpus
    pass — the production retrieval shape (serving and hard-negative
    mining score thousands of queries; calling a single-query top-k Q
    times rescans the corpus Q times).

    Plan: the query batch broadcasts (it is small by construction);
    the corpus scans once, scoring every (query, vector) pair with
    the same JVM ``aggregate``/``zip_with`` cosine as
    :func:`brute_force_topk`; per-query top-k is a rank window over
    SLIM (query_id, vec_id, cosine) rows — the only shuffle carries
    ~24 bytes/row × Q·N, never the vectors.  Ties broken by ascending
    id, matching the single-query operator exactly (which is also
    what makes the DuckDB oracle a plain window expression).
    """
    from pyspark.sql import Window

    from .dedup import _spread

    q = queries.select(
        F.col(query_id_col).alias("__bt_qid"),
        F.col(query_vec_col).cast("array<double>").alias("__bt_qvec"),
    )
    # project the corpus down to (id, vec) BEFORE the join (no column
    # collisions with the internal names, and nothing wider rides the
    # scoring stage), and _spread it: the Q×dim cosine work otherwise
    # runs inside the parquet scan's stage — a single small file = 1-2
    # busy cores (the CLAUDE.md scan-stage invariant)
    corpus = _spread(df.select(F.col(id_col), F.col(vec_col)))
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col("__bt_qid").alias(query_id_col),
        F.col(id_col),
        F.round(
            cosine_col(F.col(vec_col).cast("array<double>"), F.col("__bt_qvec")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
