"""Text-analysis operators for a training-data pipeline.

All four stay JVM-side (built-in ``pyspark.sql.functions`` only — no
Python in the hot path), so they whole-stage-codegen and push down:

* language-ID: stopword-hit n-gram heuristic,
* quality scoring: length / punctuation / stopword ratios,
* token counting: whitespace + a BPE-ish regex token stream,
* document fingerprinting: normalized rolling-hash (md5) fingerprint.
"""

from __future__ import annotations

# module-level so pandas_udf type hints (stringified by the future
# import) resolve against module globals (cf. operators/similarity.py)
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword markers (heuristic; padded with spaces so
# they only hit as whole words)
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "fr": ["le", "la", "et", "est"],
    "de": ["der", "und", "die", "ist"],
    "es": ["el", "los", "que", "es"],
}

# explicit whitespace class, not \s — Java/RE2/Python \s disagree on
# \x0b and \x1c-\x1f (see operators/bpe.py, ADVICE r2); this is the
# same pretoken regex as bpe.PRETOKEN_RE
TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f\x0b]"


def _count_word(text: Column, word: str) -> Column:
    # literal replace, NOT regexp_replace: the needle has no
    # metacharacters and the literal engine skips regex compilation +
    # NFA scanning per row (measured ~3× on the 16-marker stack).
    # Same undercount-on-consecutive-duplicates semantics as the
    # DuckDB oracle's replace().
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(" "))))
        / (len(needle) - 1)
    ).cast("long")


def lang_score_columns(text: Column) -> list[Column]:
    return [
        sum(_count_word(text, w) for w in words).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pick the language whose markers hit most (ties → lexicographic).

    Expressed as greatest-of-structs so the whole operator is one
    codegen'd projection.
    """
    text = F.col(text_col)
    scored = df.select(
        "*", *lang_score_columns(text)
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(
        *[
            F.struct(
                F.col(f"score_{l}").alias("s"),
                # invert lexicographic rank so greatest() breaks score
                # ties toward the alphabetically-first language
                F.lit(len(langs) - i).alias("r"),
                F.lit(l).alias("lang"),
            )
            for i, l in enumerate(langs)
        ]
    )
    return scored.withColumn(
        "detected_lang",
        F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punct/stopword quality heuristics (all built-in exprs)."""
    text = F.col(text_col)
    n_chars = F.length(text)
    tokens = F.split(F.trim(text), r"\s+")
    n_tokens = F.size(tokens)
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop_hits = sum(_count_word(text, w) for ws in LANG_MARKERS.values() for w in ws)
    return (
        df.withColumn("n_chars_q", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn(
            "avg_token_len",
            F.round((n_chars - n_tokens + 1) / n_tokens, 4).cast("double"),
        )
        .withColumn("punct_ratio", F.round(n_punct / n_chars, 4).cast("double"))
        .withColumn("stopword_ratio", F.round(stop_hits / n_tokens, 4).cast("double"))
        .withColumn(
            "quality_ok",
            (n_tokens >= 5) & (n_chars >= 20) & ((n_punct / n_chars) < 0.2),
        )
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish regex token counts."""
    text = F.col(text_col)
    return df.withColumn(
        "ws_tokens", F.size(F.split(F.trim(text), r"\s+")).cast("long")
    ).withColumn(
        "bpe_ish_tokens", F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0))).cast("long")
    )


def repetition_ratio(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Intra-document repetition: fraction of word n-grams that are
    duplicates of an earlier n-gram (0 = no repetition).  The standard
    crawl-quality signal for boilerplate / spam / degenerate generation
    (cf. the dedup filters in public C4/CCNet/Gopher pipelines).  Pure
    built-in expressions — codegen, no shuffle."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    sz = F.size(toks)
    # n-grams as arrays_zip of n shifted slices — one pass per slice,
    # no per-gram lambda eval or string concatenation (measured ~3×
    # vs transform+concat_ws; semantics identical: tokens can't
    # contain spaces, so struct equality ⇔ joined-string equality)
    width = sz - (n - 1)
    grams = F.arrays_zip(*[F.slice(toks, i + 1, width) for i in range(n)])
    ratio = F.when(
        sz <= n, F.lit(0.0)
    ).otherwise(F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams))
    return df.withColumn("repetition_ratio", F.round(ratio, 6).cast("double"))


# PII patterns — deliberately inside the Java-regex ∩ RE2 common
# subset (no lookaround/backrefs) so the DuckDB oracle replicates the
# scrub exactly.  Heuristic recall, like every regex PII pass; a real
# deployment layers an NER model behind the same column contract.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d().-]{7,}\d\b", "<PHONE>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / phone-like digit runs and count each
    kind (the standard pre-training scrub pass).  Pure
    ``regexp_extract_all`` + chained ``regexp_replace`` — codegen, no
    Python; applied in PII_PATTERNS order on both the engine and the
    oracle side."""
    text = F.col(text_col)
    out = df
    redacted = text
    for name, pat, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(redacted, F.lit(pat), F.lit(0))).cast("long"),
        )
        redacted = F.regexp_replace(redacted, pat, token)
    return out.withColumn("text_redacted", redacted)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized content fingerprint: lowercase, strip non-alnum,
    md5 — stable across whitespace/punctuation jitter."""
    normalized = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]", "")
    return df.withColumn("fingerprint", F.md5(normalized))


def boilerplate_lines(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lines (``\\n``-separated) that occur in ≥ ``min_docs`` DISTINCT
    documents — the CCNet/RefinedWeb-style corpus-level boilerplate
    set (nav bars, cookie banners, footers repeated across a crawl).
    Blank/whitespace-only lines are never boilerplate.  One
    explode + one groupBy shuffle; the output is typically tiny
    relative to the corpus (only lines shared across documents
    survive the HAVING)."""
    lines = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "\n")).alias("line")
    )
    return (
        lines.filter(F.length(F.trim("line")) > 0)
        .groupBy("line")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_lines(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level line dedup: drop every line that appears in
    ≥ ``min_docs`` distinct documents, preserving line order (and the
    document row even if ALL its lines were boilerplate).  Returns
    ``(id_col, text_clean, n_lines_removed)``.

    Shape: posexplode → LEFT join against the (tiny, post-HAVING)
    boilerplate set with a marker column → ONE groupBy that both
    reassembles the kept lines (``collect_list`` skips the nulled-out
    boilerplate entries) and counts removals — so the corpus is
    scanned twice (once to build the set, once to rewrite), not three
    times, and there is no corpus-scale reassembly join.  Never
    O(corpus²).
    """
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    bp = (
        exploded.filter(F.length(F.trim("line")) > 0)
        .groupBy("line")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("line", F.lit(1).alias("_bp"))
    )
    marked = exploded.join(bp, "line", "left")
    return marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_bp").isNull(), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_clean"),
        F.count("_bp").cast("int").alias("n_lines_removed"),
    )


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4/CCNet-style text normalization: lowercase, strip C0/C1
    control characters, collapse whitespace runs to single spaces,
    trim.  Pure codegen projection — no shuffle, no Python — and
    engine-portable (the oracle replicates each step exactly).
    Unicode NFC canonicalization is deliberately NOT part of this
    operator: Spark SQL has no normalization builtin, so callers that
    need it should apply a pandas UDF over ``unicodedata.normalize``
    upstream (the slow path, used only when the corpus is known to
    mix compositions)."""
    t = F.lower(F.col(text_col))
    # C0 (minus the whitespace chars collapsed below) + DEL + C1 —
    # C1 (U+0080–U+009F) is the classic cp1252/latin-1 mojibake range
    t = F.regexp_replace(t, r"[\x00-\x08\x0e-\x1f\x7f-\x9f]", "")
    t = F.regexp_replace(t, _QC_WS, " ")
    return df.withColumn("text_norm", F.trim(t))


def chunk_documents(
    df: DataFrame,
    window: int = 128,
    stride: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token windows (the
    RAG/long-context chunking step): chunk ``i`` covers tokens
    ``[i·stride, i·stride + window)``; every document yields at least
    one chunk.  One row per chunk with
    ``(id, chunk_idx, chunk_text, n_chunk_tokens)``.

    Narrow plan: token array projected once per row (see
    decontam.ngrams_of_tokens for why it must NOT stay inline), chunk
    starts generated JVM-side, posexplode — no shuffle at all, and
    the ~window/stride× output amplification happens after the scan,
    never across the wire."""
    if window <= 0 or stride <= 0:
        raise ValueError(f"window and stride must be positive, got {window}/{stride}")
    toks = F.col("_toks")
    n = F.size(toks)
    # standard overlapping-window count: the last chunk STARTS at the
    # final position where an unseen token remains, so no chunk is
    # ever a strict sub-span of its predecessor (n_chunks =
    # ceil(n/stride) would append a 100%-redundant tail chunk to
    # every doc longer than one window)
    n_chunks = F.greatest(
        (F.ceil((n - window) / stride) + 1).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * stride + 1, window), " "),
    )
    return (
        # explicit ws class: Java/RE2 \s diverge on \x0b (oracle parity)
        df.withColumn("_toks", F.split(F.trim(F.col(text_col)), _QC_WS))
        .select(
            F.col(id_col),
            "_toks",
            F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            "chunk_text",
            F.least(
                F.size(F.col("_toks")) - F.col("chunk_idx") * stride,
                F.lit(window),
            ).cast("int").alias("n_chunk_tokens"),
        )
    )


# ---- trainable quality classifier (fasttext-style linear model) --------------
# The learned upgrade to the heuristic quality_score: a logistic model
# over hashed token features (the fasttext / Joulin et al. 2017 "Bag
# of Tricks" construction), trained like learn_bpe — driver fit on a
# deterministic md5-ordered sample, weights broadcast, scoring
# Arrow-batched over JVM-hashed features.  This is how public corpus
# pipelines (CCNet, GPT-3 §A, Llama) gate web documents: a small
# classifier scored over the full 100-TB corpus.

from .bpe import WS_RE as _QC_WS  # shared oracle-parity regex


def hashed_token_buckets(text: Column, n_features: int = 2048) -> Column:
    """Per-document hashed-token feature ids as ``array<int>`` —
    ``xxhash64(token) mod n_features``, entirely JVM-side (codegen),
    so the 100-TB scoring scan ships only small int arrays into the
    Arrow stage.  The SAME expression feeds training-sample collection
    and scoring: train/score feature parity is by construction, not by
    reimplementing a hash in two languages."""
    toks = F.split(F.trim(text), _QC_WS)
    return F.transform(
        toks, lambda t: F.pmod(F.xxhash64(t), F.lit(n_features)).cast("int")
    )


def train_quality_classifier(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 2048,
    sample_n: int = 4096,
    seed: int = 7,
    iters: int = 1500,
    lr: float = 2.0,
):
    """Fit logistic weights over hashed-token count features on a
    deterministic driver-side sample (md5-ordered — the learn_bpe /
    pq_train shape: TakeOrderedAndProject, no full sort, resumable).

    The fit itself is full-batch gradient descent from zero init with
    a fixed iteration count — bit-deterministic for a given sample,
    unlike MLlib's LBFGS whose float summation order varies with
    partitioning (prediction-level determinism is what the driver
    oracle hashes).  Returns a numpy array of ``n_features + 1``
    weights (bias last).
    """
    import numpy as np

    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#qc{seed}")))
    rows = (
        df.select(
            hashed_token_buckets(F.col(text_col), n_features).alias("b"),
            F.col(label_col).cast("double").alias("y"),
            key.alias("k"),
        )
        .orderBy("k")
        .limit(sample_n)
        .collect()
    )
    n = len(rows)
    if n == 0:
        raise ValueError("empty training frame")
    X = np.zeros((n, n_features), dtype=np.float64)
    y = np.empty(n, dtype=np.float64)
    for i, r in enumerate(rows):
        b = np.asarray(r["b"], dtype=np.int64)
        np.add.at(X[i], b, 1.0)
        X[i] /= max(len(b), 1)  # mean-of-features (fasttext averaging)
        y[i] = r["y"]
    w = np.zeros(n_features, dtype=np.float64)
    bias = 0.0
    for _ in range(iters):
        z = X @ w + bias
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g) / n
        bias -= lr * g.mean()
    return np.concatenate([w, [bias]])


def quality_classify(
    df: DataFrame,
    weights,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document with broadcast weights: adds
    ``quality_prob`` (sigmoid of the mean hashed-feature weight +
    bias) and ``quality_pred``.  Features are the same JVM
    ``hashed_token_buckets`` expression as training; the Arrow stage
    does one flat gather + segment-sum per batch (np.add.reduceat) —
    no per-row Python."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    W = np.asarray(weights, dtype=np.float64)
    w, bias = W[:-1], float(W[-1])
    n_features = len(w)

    @pandas_udf("double")
    def prob(buckets: pd.Series) -> pd.Series:
        if buckets.empty:
            return pd.Series([], dtype=np.float64)
        arrs = buckets.to_numpy()
        # NULL text → NULL bucket array: score it as an empty doc
        # (bias only) instead of crashing on len(None)
        lens = np.fromiter(
            (0 if a is None else len(a) for a in arrs),
            dtype=np.int64,
            count=len(arrs),
        )
        flat = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in arrs if a is not None]
        ) if lens.sum() else np.empty(0, dtype=np.int64)
        sums = np.zeros(len(arrs), dtype=np.float64)
        nz = lens > 0
        if nz.any():
            offsets = np.zeros(len(arrs), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            seg = np.add.reduceat(w[flat], offsets[nz])
            sums[nz] = seg
        z = sums / np.maximum(lens, 1) + bias
        return pd.Series(1.0 / (1.0 + np.exp(-z)))

    scored = df.withColumn(
        "quality_prob",
        prob(hashed_token_buckets(F.col(text_col), n_features)),
    )
    return scored.withColumn(
        "quality_pred", (F.col("quality_prob") >= F.lit(threshold))
    )


# ---- Gopher quality rules (Rae et al. 2021, §A1.1) ---------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The published Gopher document-quality rules as one codegen
    projection (Rae et al. 2021 §A1.1 — the de-facto standard
    rule-based pre-filter, reused by MassiveText/RefinedWeb/Dolma):
    word-count band, mean word length band, '#'/'…' symbol-to-word
    ratio, bullet-start and ellipsis-end line fractions, fraction of
    words with an alphabetic character, and the ≥2-of-8 stopword
    presence rule.  Zero shuffles, every metric a built-in expression
    (engine-portable: explicit whitespace class, ASCII alpha test) so
    the DuckDB oracle replicates it term-for-term.

    Adds every metric column plus the ``gopher_ok`` verdict —
    downstream pipelines filter on the flag but keep the metrics for
    audit (the no-silent-caps rule applied to filtering)."""
    text = F.col(text_col)
    toks = F.split(F.trim(text), _QC_WS)
    pre = df.withColumn("_toks", toks).withColumn("_lines", F.split(text, "\n"))

    n_words = F.size("_toks")
    n_chars_in_words = F.aggregate(
        F.transform("_toks", lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    mean_word_len = F.when(
        n_words > 0, F.round(n_chars_in_words / n_words, 4)
    ).otherwise(F.lit(0.0))
    # Gopher's symbol set: '#' and ellipsis ('...' counted once per
    # occurrence, plus the unicode char)
    n_symbols = (
        (F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit(""))))
        + (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3
        + (F.length(text) - F.length(F.replace(text, F.lit("…"), F.lit(""))))
    ).cast("long")
    symbol_word_ratio = F.when(
        n_words > 0, F.round(n_symbols / n_words, 4)
    ).otherwise(F.lit(0.0))

    n_lines = F.size("_lines")
    bullet_lines = F.size(
        F.filter(
            "_lines",
            lambda l: F.trim(l).startswith("•") | F.trim(l).startswith("- ")
            | F.trim(l).startswith("* "),
        )
    )
    ellipsis_lines = F.size(
        F.filter(
            "_lines",
            lambda l: F.trim(l).endswith("...") | F.trim(l).endswith("…"),
        )
    )
    bullet_line_frac = F.when(
        n_lines > 0, F.round(bullet_lines / n_lines, 4)
    ).otherwise(F.lit(0.0))
    ellipsis_line_frac = F.when(
        n_lines > 0, F.round(ellipsis_lines / n_lines, 4)
    ).otherwise(F.lit(0.0))

    alpha_words = F.size(F.filter("_toks", lambda t: t.rlike("[a-zA-Z]")))
    alpha_word_frac = F.when(
        n_words > 0, F.round(alpha_words / n_words, 4)
    ).otherwise(F.lit(0.0))

    stop_hits = sum(
        F.when(
            F.concat(F.lit(" "), F.lower(text), F.lit(" ")).contains(f" {w} "),
            1,
        ).otherwise(0)
        for w in GOPHER_STOPWORDS
    )

    out = (
        pre.withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len", mean_word_len.cast("double"))
        .withColumn("symbol_word_ratio", symbol_word_ratio.cast("double"))
        .withColumn("bullet_line_frac", bullet_line_frac.cast("double"))
        .withColumn("ellipsis_line_frac", ellipsis_line_frac.cast("double"))
        .withColumn("alpha_word_frac", alpha_word_frac.cast("double"))
        .withColumn("stop_hits", stop_hits.cast("int"))
    )
    ok = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return out.withColumn("gopher_ok", ok).drop("_toks", "_lines")


# ---- perplexity filtering (CCNet-style LM scoring) ---------------------------

def perplexity_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style language-model filtering, self-contained: score
    every document under a Laplace-smoothed BIGRAM model trained on
    the corpus itself (CCNet trains KenLM on Wikipedia and buckets
    documents by perplexity — the model here is corpus-trained since
    no external LM can ship offline, but the scoring surface and the
    head/middle/tail bucketing use is identical).

    Fully relational — ZERO Python anywhere:

    * unigram + bigram count tables are two groupBys (map-side
      partial aggregation; at 100 TB the model tables are themselves
      distributed — never collected);
    * scoring is the doc-bigram frame left-joined against both count
      tables (8-byte-ish string keys, AQE-handled), then one
      groupBy(doc) for the mean log-prob;
    * ``log((c(w1,w2) + 1) / (c(w1) + V))`` per bigram;
      ``perplexity = exp(-mean)``; docs with < 2 tokens score
      perplexity 1 (empty product convention).

    Returns ``(id_col, n_bigrams, avg_logprob, perplexity)``.
    """
    toks = F.split(F.trim(F.col(text_col)), _QC_WS)
    base = df.select(F.col(id_col), toks.alias("_toks"))

    # vocab size enters the plan LAZILY as a broadcast 1-row
    # cross join rather than a driver .count() action: no eager job,
    # and no .persist() the function could never unpersist (a
    # long-lived session would leak one cached table per call).  The
    # uni subplan appears twice (vocab agg + scoring join) with an
    # identical shape, which Spark's ReusedExchange can serve from
    # one execution.  doc_bi below is NOT persisted by choice: it is
    # corpus-sized, and recomputing one explode is the scale-correct
    # trade (same rationale as dedup.duplicated_passages' two scans).
    uni = (
        base.select(F.explode("_toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("_cu"))
    )
    vocab = uni.agg(F.count("*").alias("_V"))

    n = F.size("_toks")
    pairs = F.arrays_zip(
        F.slice("_toks", 1, n - 1).alias("w1"),
        F.slice("_toks", 2, n - 1).alias("w2"),
    )
    doc_bi = base.select(
        F.col(id_col), F.explode(pairs).alias("_b")
    ).select(id_col, F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))

    bi = doc_bi.groupBy("w1", "w2").agg(F.count("*").alias("_cb"))

    logp = F.log(
        (F.coalesce(F.col("_cb"), F.lit(0)) + 1)
        / (F.coalesce(F.col("_cu"), F.lit(0)) + F.col("_V"))
    )
    scored = (
        doc_bi.join(bi, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg(logp).alias("_avg"),
        )
    )
    out = base.select(id_col).join(scored, id_col, "left")
    avg = F.coalesce(F.col("_avg"), F.lit(0.0))
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.round(avg, 6).cast("double").alias("avg_logprob"),
        F.round(F.exp(-avg), 6).cast("double").alias("perplexity"),
    )


# ---- URL curation (crawl-level filtering) ------------------------------------

# engine-portable URL pieces: one regex, identical in Java and RE2
_URL_DOMAIN_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Crawl-curation URL features as a zero-shuffle codegen
    projection: registered domain (host without port/userinfo,
    lowercased), top-level domain, path depth, and query-string
    presence — the columns URL-level blocklists, TLD allowlists and
    per-domain caps key on (the C4/RefinedWeb URL-filter stage)."""
    url = F.col(url_col)
    host = F.lower(
        F.regexp_extract(
            F.regexp_extract(F.lower(url), _URL_DOMAIN_RE, 1),
            r"^(?:[^@]*@)?([^:]+)",
            1,
        )
    )
    tld = F.regexp_extract(host, r"\.([a-z0-9-]+)$", 1)
    # lower() here too: an uppercase scheme ("HTTP://…") must not make
    # the path regex miss while the domain regex (on lower) matches
    path = F.regexp_extract(F.lower(url), r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    depth = F.when(
        path == "", F.lit(0)
    ).otherwise(
        F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    )
    return (
        df.withColumn("domain", host)
        .withColumn("tld", tld)
        .withColumn("path_depth", depth.cast("int"))
        # '?' only counts BEFORE any '#': a question mark inside the
        # fragment is not a query component (RFC 3986)
        .withColumn("has_query", url.rlike(r"^[^#]*\?"))
    )


def filter_url_blocklist(
    df: DataFrame,
    blocked_domains: list[str],
    url_col: str = "url",
    keep_features: bool = True,
    filter_blocked: bool = True,
) -> DataFrame:
    """Drop documents whose registered domain is on the blocklist
    (exact domain OR any subdomain of a blocked entry).  The list is
    inlined as codegen predicates for the usual few-thousand-entry
    lists; past ~10⁴ entries switch to a broadcast anti-join on the
    ``domain`` column from :func:`url_features`.

    ``filter_blocked=False`` is the METRICS mode: every row comes
    back with a real ``url_blocked`` flag (count it to report what
    the blocklist would remove).  With filtering on, the flag would
    be constant False, so it is dropped rather than carried as dead
    data.  ``keep_features`` controls the domain/tld/depth/query
    columns."""
    feats = url_features(df, url_col)
    blocked = F.lit(False)
    for d in sorted(set(blocked_domains)):
        d = d.lower()
        blocked = blocked | (F.col("domain") == d) | F.col("domain").endswith("." + d)
    out = feats.withColumn("url_blocked", blocked)
    if filter_blocked:
        out = out.filter(~F.col("url_blocked")).drop("url_blocked")
    if not keep_features:
        out = out.drop("domain", "tld", "path_depth", "has_query")
    return out
