"""Sparse lexical retrieval (Okapi BM25) over a text corpus.

Dense retrieval (similarity.py: brute-force / LSH / IVF / PQ / sq8)
covers the embedding side; a training-data pipeline equally needs
LEXICAL retrieval — benchmark-leak triage before the n-gram
decontamination pass (decontam.py), corpus search, and hard-negative
mining for classifier training (text_analysis.train_quality_classifier)
all start from "which documents mention these terms".  BM25 is the
standard scoring function (Robertson & Zaragoza 2009, "The
Probabilistic Relevance Framework: BM25 and Beyond").

Scale shape (100 TB): ``doc_terms`` is one explode + one partial-agg
groupBy — the postings build is a single shuffle keyed on
``(doc_id, term)`` and is built ONCE then reused across queries
(persist it or write it to an icelite table).  A query then touches
only the postings rows of its |q| distinct terms: the ``isin`` filter
prunes at the scan (parquet row-group stats on ``term`` when the
postings are stored sorted/z-ordered by term), the per-term document
frequencies are |q| rows joined by broadcast, the corpus-level
(N, avgdl) pair is a 1-row crossJoin (broadcast, stays lazy — no
driver collect), and the final ranking is a TakeOrderedAndProject.
Nothing on the query path shuffles the corpus.

Scoring detail: scores are rounded to 6 decimals BEFORE ranking, in
both this implementation and the DuckDB oracle (queries.py), so that
cross-engine float-summation-order ULP noise cannot flip the
boundary of the top-k set (same rule as similarity.py's cosine
ranking).  Ties break on ascending doc id.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from .bpe import WS_RE

# IDF uses the "+1 inside the log" variant (Lucene's choice): strictly
# positive even for terms in more than half the corpus, so a stopword
# in the query degrades ranking instead of poisoning it with a
# negative score.
DEFAULT_K1 = 1.5
DEFAULT_B = 0.75

_WS_C = re.compile(WS_RE)


def tokenize_query(query: str) -> list[str]:
    """Driver-side query tokenization — the SAME whitespace contract
    as the corpus side (bpe.WS_RE; trim strips spaces only, matching
    Spark/DuckDB trim())."""
    terms = [t for t in _WS_C.split(query.strip(" ")) if t]
    # sorted distinct: deterministic plan text and oracle literals
    return sorted(set(terms))


def doc_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Postings frame: one row per (doc, term) with term frequency and
    the doc's token length.  Columns: ``<id_col>, dl, term, tf``.

    ``dl`` counts split() elements exactly like token_counts'
    ws_tokens (an all-whitespace doc yields one empty-string token in
    BOTH engines — the established oracle-parity quirk), so BM25
    length normalization is engine-portable.
    """
    toks = F.split(F.trim(F.col(text_col)), WS_RE)
    return (
        df.select(
            F.col(id_col),
            F.size(toks).cast("long").alias("dl"),
            F.explode(toks).alias("term"),
        )
        # dl is functionally dependent on the id; carrying it through
        # the groupBy key avoids a second join back to a lengths table
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def corpus_stats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """1-row frame ``(n_docs, avgdl)`` — kept as a lazy crossJoin side
    (Spark broadcasts single-row aggregates), not a driver collect.

    NULL-text rows are NOT documents: they carry no terms (explode of
    a null token array emits nothing, so they have no postings rows
    either), and counting them here while the postings-derived stats
    path can't see them would make the two bm25_topk entry points
    disagree on N — the df path filters them out so both paths compute
    identical stats on any corpus (review r6 pass 2)."""
    df = df.filter(F.col(text_col).isNotNull())
    toks = F.split(F.trim(F.col(text_col)), WS_RE)
    return df.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size(toks).cast("double")).alias("avgdl"),
    )


def stats_from_postings(postings: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(N, avgdl) derived from a postings frame — a caller who
    pre-built doc_terms must NOT pay a full corpus re-scan per query
    just for one constant pair.  Complete by construction: split()
    yields ≥1 element for every non-null-text doc (an all-whitespace
    doc contributes one empty-string term), so every doc has ≥1
    postings row and distinct (id, dl) is the exact doc-lengths
    table."""
    return (
        postings.select(id_col, "dl")
        .distinct()
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg(F.col("dl").cast("double")).alias("avgdl"),
        )
    )


def _bm25_score(k1: float, b: float):
    """THE BM25 scoring expression — single source; its association
    order is pinned to the DuckDB oracles (CLAUDE.md round-6
    invariant), so every entry point must build scores from this
    Column, never respell it."""
    n, avgdl = F.col("n_docs"), F.col("avgdl")
    tf, dl = F.col("tf").cast("double"), F.col("dl").cast("double")
    idf = F.log((n - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def _topk_from_hits(
    hits: DataFrame, stats: DataFrame, id_col: str, k: int,
    k1: float, b: float,
) -> DataFrame:
    """Shared single-query tail: broadcast df + stats joins, rounded
    sum, TakeOrderedAndProject."""
    dfreq = hits.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    return (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(_bm25_score(k1, b)), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_topk(
    df: DataFrame | None,
    query: str,
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents for ``query`` under Okapi BM25.

    Pass a precomputed ``postings`` (from :func:`doc_terms`, e.g. read
    back from an icelite table) to skip the corpus pass entirely —
    the intended shape for repeated queries at scale; ``df`` may then
    be None (nothing touches the raw corpus: even the (N, avgdl)
    stats derive from the postings).
    Returns ``(<id_col>, bm25)`` with bm25 rounded to 6 decimals.
    """
    qterms = tokenize_query(query)
    if not qterms:
        raise ValueError("query has no terms after whitespace tokenization")
    if postings is None:
        if df is None:
            raise ValueError("bm25_topk needs df or postings")
        # term filter BEFORE the tf aggregate (guide §2.3): term is a
        # group key, so filtering the exploded token stream first is
        # identical — and the partial-agg shuffle then carries only the
        # |q| query terms' rows instead of the whole corpus vocabulary
        hits = _query_hits(df, qterms, text_col, id_col)
        stats = corpus_stats(df, text_col=text_col)
    else:
        stats = stats_from_postings(postings, id_col)
        hits = postings.filter(F.col("term").isin(qterms))
    return _topk_from_hits(hits, stats, id_col, k, k1, b)


def _exploded_terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """``(id, dl, term)`` token stream — the pre-aggregation shape of
    :func:`doc_terms` (same dl/explode semantics)."""
    toks = F.split(F.trim(F.col(text_col)), WS_RE)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        F.explode(toks).alias("term"),
    )


def _query_hits(
    df: DataFrame, qterms: list[str], text_col: str, id_col: str
) -> DataFrame:
    """tf rows for just ``qterms``, with the filter below the
    aggregate: equivalent to ``doc_terms(df).filter(term.isin(qterms))``
    because ``term`` is a group key, but the shuffle is |q|-terms-sized."""
    return (
        _exploded_terms(df, text_col, id_col)
        .filter(F.col("term").isin(qterms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def query_terms(
    queries_df: DataFrame, query_col: str = "query", qid_col: str = "query_id"
) -> DataFrame:
    """Distinct ``(qid, term)`` rows from a query table — the same
    whitespace contract as the corpus side, evaluated in Spark (no
    driver tokenization: the query table may itself be large, e.g. a
    benchmark's full eval set for leak triage)."""
    toks = F.split(F.trim(F.col(query_col)), WS_RE)
    return (
        queries_df.select(F.col(qid_col), F.explode(toks).alias("term"))
        .filter(F.length("term") > 0)
        .distinct()
    )


def bm25_batch_topk(
    df: DataFrame | None,
    queries_df: DataFrame,
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_col: str = "query",
    qid_col: str = "query_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Top-k per query for a whole TABLE of queries in ONE postings
    pass — the lexical mirror of similarity.batch_topk (run the full
    benchmark eval set against the corpus before a decontamination
    pass, instead of one bm25_topk job per question).

    Returns ``(qid, <id_col>, bm25, rank)`` with rank 1..k per qid,
    scores rounded to 6 decimals BEFORE ranking (the cross-engine
    ULP rule), ties on ascending doc id.

    Scale shape: the query-term table is broadcast into the postings
    join (a 10⁵-query eval set is a few MB of distinct terms), per-term
    document frequencies are one small broadcast aggregate, scoring
    shuffles only slim ``(qid, id, partial score)`` rows on one
    groupBy, and the per-query cut is a row_number window that
    Catalyst executes as WindowGroupLimit — each map task prunes to
    its local top-k BEFORE the shuffle, so no query's full posting
    list is ever sorted on one task.
    """
    from pyspark.sql import Window

    qt = query_terms(queries_df, query_col=query_col, qid_col=qid_col)
    # distinct terms once: df per term is query-independent
    terms = qt.select("term").distinct()
    if postings is None:
        if df is None:
            raise ValueError("bm25_batch_topk needs df or postings")
        # broadcast-semi the query terms into the token stream BEFORE
        # the tf aggregate (guide §2.3/§3.2): term is a group key, so
        # this is row-identical to aggregating the full vocabulary and
        # joining after — but the partial-agg shuffle carries only the
        # eval set's terms instead of one row per distinct (doc, term)
        hits = (
            _exploded_terms(df, text_col, id_col)
            .join(F.broadcast(terms), "term")
            .groupBy(id_col, "dl", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        )
        stats = corpus_stats(df, text_col=text_col)
    else:
        stats = stats_from_postings(postings, id_col)
        hits = postings.join(F.broadcast(terms), "term")
    dfreq = hits.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        hits.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(qid_col, id_col)
        .agg(F.round(F.sum(_bm25_score(k1, b)), 6).alias("bm25"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def top_terms_per_doc(
    df: DataFrame | None,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Per-document keyword extraction: the top-``n`` terms by
    smoothed TF-IDF (sklearn's ``ln((1+N)/(1+df)) + 1`` idf with a
    ``tf/dl`` length-normalized term weight) — corpus exploration,
    topic tagging, and cluster labeling over the same postings frame
    BM25 queries use.

    Returns ``(<id_col>, term, tfidf, rank)`` with rank 1..n per doc,
    tfidf rounded to 6 decimals BEFORE ranking (cross-engine ULP
    rule), ties on ascending term.

    Scale shape: document frequencies are one vocabulary-sized
    aggregate joined back on the term key (vocab is NOT broadcastable
    at corpus scale — this is a plain co-partitioned shuffle join, and
    the only one in the plan beyond the postings build); the per-doc
    cut is WindowGroupLimit (map-side top-n before the shuffle).
    """
    if postings is None:
        if df is None:
            raise ValueError("top_terms_per_doc needs df or postings")
        postings = doc_terms(df, text_col=text_col, id_col=id_col)
    stats = (
        postings.select(id_col, "dl")
        .distinct()
        .agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    )
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    from pyspark.sql import Window

    tf, dl = F.col("tf").cast("double"), F.col("dl").cast("double")
    idf = F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0
    score = tf / dl * idf
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        postings.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("tfidf", F.round(score, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select(id_col, "term", "tfidf", "rank")
    )


def bm25_topk_table(
    table,
    spark,
    query: str,
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    stats: DataFrame | None = None,
) -> DataFrame:
    """BM25 over an icelite POSTINGS table (a doc_terms materialized
    view — see plans/matview.postings_transform), with manifest-level
    FILE SKIPPING on the query's terms: ``read(prune=[('term', 'in',
    ...)])`` drops every data file whose min/max term range provably
    excludes all query terms before the scan is even built.  After a
    ``compact(sort_within_buckets=['term'])`` or term z-order rewrite,
    each file covers a tight term slice and a 2-3-term query reads a
    handful of files out of a 100-TB index — the icelite stats-prune
    path doing the job of an inverted index's seek.

    The prune is a superset guarantee (files without stats are kept),
    and (N, avgdl) must see ALL docs, so stats derive from the
    UNPRUNED table read while only the scoring scan is pruned.  Both
    reads are pinned to the SAME snapshot (a concurrent matview
    maintenance commit landing between them would otherwise bind
    stats and hits to different table states).  Pass a precomputed
    1-row ``stats`` frame (cache :func:`stats_from_postings` of one
    read per maintenance cycle) to skip even that unpruned (id, dl)
    pass — the repeated-query shape; per-query cost is then the
    pruned files only.
    """
    qterms = tokenize_query(query)
    if not qterms:
        raise ValueError("query has no terms after whitespace tokenization")
    tip = table.current_snapshot()
    sid = tip["snapshot_id"] if tip else None
    if stats is None:
        full = table.read(spark, as_of_snapshot=sid).select(id_col, "dl")
        stats = stats_from_postings(full, id_col)
    pruned = table.read(
        spark, as_of_snapshot=sid, prune=[("term", "in", *qterms)]
    ).select(id_col, "dl", "term", "tf")
    hits = pruned.filter(F.col("term").isin(qterms))
    return _topk_from_hits(hits, stats, id_col, k, k1, b)
