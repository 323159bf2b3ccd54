"""Query surface for the driver contract (__spark_entry__.py).

Every operator family from SURVEY.md §2 gets a named query
``(spark, sf_dir) -> DataFrame`` and — wherever ANSI-SQL can express
the same semantics — a DuckDB oracle string over the driver's
pre-registered views.

Extraction queries synthesize HTML from the flat ``documents`` table
with SQL string concatenation; because the driver's text corpus is
whitespace-clean, the kernel's output span offsets are closed-form
arithmetic over ``length(text)`` — so even the full HTML extraction
path is oracle-checked (span-sequence equality per BASELINE.json).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators import (
    bpe,
    decontam,
    dedup,
    multimodal,
    packing,
    retrieval,
    sampling,
    similarity,
    stats,
    text_analysis,
)
from .operators.extract import extract_documents, explode_spans
from .sources.readers import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# =========================================================================
# Extraction family (kernel through Spark; oracle = closed-form offsets)
# =========================================================================

# HTML template: <html><head><title>t</title></head><body>
#   <h1>Title {doc_id}</h1><div class="main"><p>{text}</p></div>
#   <footer>boilerplate footer</footer></body></html>
# Under boilerplate_strip the footer subtree is removed; survivors are
# body/h1/div/p with offsets:   L = length('Title ' || doc_id),
# T = length(text):
#   body: cs=0   rs=0  ce=L+T+2  re=1  offset=0
#   h1:   cs=0   rs=1  ce=L      re=0  offset=1
#   div:  cs=L+1 rs=0  ce=L+T+2  re=0  offset=2
#   p:    cs=L+1 rs=1  ce=L+T+1  re=0  offset=3

def _flagship_documents(docs: DataFrame) -> DataFrame:
    html = F.concat(
        F.lit('<html><head><title>t</title></head><body><h1>Title '),
        F.col("doc_id").cast("string"),
        F.lit('</h1><div class="main"><p>'),
        F.col("text"),
        F.lit('</p></div><footer>boilerplate footer</footer></body></html>'),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                html.alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )


def q_extract_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    ext = extract_documents(_flagship_documents(_docs(spark, sf_dir)), "boilerplate_strip")
    return (
        explode_spans(ext)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("tag"),
            "char_start_idx", "relative_start_pos",
            "char_end_idx", "relative_end_pos", "offset",
        )
    )


ORACLE_FLAGSHIP = """
WITH base AS (
  SELECT doc_id,
         CAST(length('Title ' || CAST(doc_id AS VARCHAR)) AS INTEGER) AS l,
         CAST(length(text) AS INTEGER) AS t
  FROM documents
)
SELECT doc_id, 'body' AS tag,
       CAST(0 AS INTEGER) AS char_start_idx, CAST(0 AS INTEGER) AS relative_start_pos,
       CAST(l + t + 2 AS INTEGER) AS char_end_idx, CAST(1 AS INTEGER) AS relative_end_pos,
       CAST(0 AS INTEGER) AS offset FROM base
UNION ALL
SELECT doc_id, 'h1', 0, 1, l, 0, 1 FROM base
UNION ALL
SELECT doc_id, 'div', l + 1, 0, l + t + 2, 0, 2 FROM base
UNION ALL
SELECT doc_id, 'p', l + 1, 1, l + t + 1, 0, 3 FROM base
"""


def q_extract_interleaved_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved text+media document: media span anchored in order,
    must come out as a zero-length media span at the exact offset."""
    docs = _docs(spark, sf_dir)
    inter = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.concat(F.lit("<html><body><p>"), F.col("text"), F.lit(" ")).alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                F.concat(F.lit("media://img/"), F.col("doc_id").cast("string")).alias("media_ref"),
                F.lit(1).alias("offset"),
            ),
            F.struct(
                F.lit("html").alias("kind"),
                F.lit("</p></body></html>").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(2).alias("offset"),
            ),
        ).alias("spans"),
    )
    ext = extract_documents(inter, "keep_everything")
    return explode_spans(ext).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "tag", "kind", "media_ref",
        "char_start_idx", "relative_start_pos",
        "char_end_idx", "relative_end_pos", "offset",
    )


ORACLE_INTERLEAVED = """
WITH base AS (
  SELECT doc_id, CAST(length(text) AS INTEGER) AS t FROM documents
)
SELECT doc_id, 'body' AS tag, 'text' AS kind, '' AS media_ref,
       CAST(0 AS INTEGER) AS char_start_idx, CAST(0 AS INTEGER) AS relative_start_pos,
       CAST(t + 1 AS INTEGER) AS char_end_idx, CAST(3 AS INTEGER) AS relative_end_pos,
       CAST(0 AS INTEGER) AS offset FROM base
UNION ALL
SELECT doc_id, 'p', 'text', '', 0, 1, t + 1, 2, 1 FROM base
UNION ALL
SELECT doc_id, 'img', 'media', 'media://img/' || CAST(doc_id AS VARCHAR),
       t + 1, 0, t + 1, 1, 2 FROM base
"""


def q_media_text_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text pair mining (OBELICS/MMC4): each media span paired
    with its nearest preceding/following text spans.  The interleaved
    input is built relationally — [text₁, media_a, text₂, media_b]
    per doc with text halves from substring — so the expected pairs
    are closed-form."""
    docs = _docs(spark, sf_dir)
    h = F.floor(F.length("text") / 2).cast("int")
    inter = docs.select(
        F.col("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.substring(F.col("text"), 1, h).alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                F.concat(F.lit("media://a/"), F.col("doc_id").cast("string")).alias("media_ref"),
                F.lit(1).alias("offset"),
            ),
            F.struct(
                F.lit("text").alias("kind"),
                F.expr("substring(text, cast(floor(length(text) / 2) as int) + 1)").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(2).alias("offset"),
            ),
            F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                F.concat(F.lit("media://b/"), F.col("doc_id").cast("string")).alias("media_ref"),
                F.lit(3).alias("offset"),
            ),
        ).alias("spans"),
    )
    return multimodal.media_text_pairs(inter).select(
        "doc_id", "media_ref", "offset", "prev_text", "next_text"
    )


ORACLE_MEDIA_TEXT_PAIRS = """
WITH b AS (
  SELECT doc_id, text, CAST(floor(length(text) / 2) AS INT) AS h
  FROM documents
)
SELECT doc_id, 'media://a/' || CAST(doc_id AS VARCHAR) AS media_ref,
       CAST(1 AS INT) AS offset,
       substr(text, 1, h) AS prev_text,
       substr(text, h + 1) AS next_text
FROM b
UNION ALL
SELECT doc_id, 'media://b/' || CAST(doc_id AS VARCHAR), CAST(3 AS INT),
       substr(text, h + 1), NULL
FROM b
"""


def q_extract_tag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ext = extract_documents(_flagship_documents(_docs(spark, sf_dir)), "boilerplate_strip")
    return (
        explode_spans(ext)
        .groupBy("tag")
        .agg(F.count("*").alias("n_spans"))
    )


ORACLE_TAG_HISTOGRAM = """
SELECT tag, count(*) AS n_spans
FROM documents, (VALUES ('body'), ('h1'), ('div'), ('p')) AS tags(tag)
GROUP BY tag
"""


def q_extract_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extracted plain text itself: 'Title {id}\\n{text}\\n'."""
    ext = extract_documents(_flagship_documents(_docs(spark, sf_dir)), "boilerplate_strip")
    return ext.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("text").alias("plain_text"),
        F.col("n_chars").alias("n_chars_out"),
        F.col("malformed").cast("int").alias("malformed"),
    )


ORACLE_TEXT_ROUNDTRIP = """
SELECT doc_id,
       'Title ' || CAST(doc_id AS VARCHAR) || chr(10) || text || chr(10) AS plain_text,
       CAST(length(text) + length('Title ' || CAST(doc_id AS VARCHAR)) + 2 AS BIGINT) AS n_chars_out,
       CAST(0 AS INTEGER) AS malformed
FROM documents
"""


def q_extract_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18+B20 through the REAL extraction: corpus describe() of the
    per-(doc,tag) text_length_mean stat."""
    ext = extract_documents(_flagship_documents(_docs(spark, sf_dir)), "boilerplate_strip")
    per_doc = stats.span_stats(ext)
    described = stats.tag_stats(per_doc).filter(F.col("stat_col") == "text_length_mean")
    return described.select(
        "tag",
        F.col("count").alias("n_docs"),
        F.round("mean", 4).alias("mean"),
        F.round("std", 4).alias("std"),
        F.round("min", 4).alias("min"),
        F.round("p25", 4).alias("p25"),
        F.round("p50", 4).alias("p50"),
        F.round("p75", 4).alias("p75"),
        F.round("max", 4).alias("max"),
    )


ORACLE_SPAN_STATS = """
WITH base AS (
  SELECT doc_id,
         length('Title ' || CAST(doc_id AS VARCHAR)) AS l,
         length(text) AS t
  FROM documents
), per_doc AS (
  SELECT doc_id, 'body' AS tag, CAST(l + t + 2 AS DOUBLE) AS v FROM base
  UNION ALL SELECT doc_id, 'h1',  CAST(l AS DOUBLE) FROM base
  UNION ALL SELECT doc_id, 'div', CAST(t + 1 AS DOUBLE) FROM base
  UNION ALL SELECT doc_id, 'p',   CAST(t AS DOUBLE) FROM base
)
SELECT tag, count(v) AS n_docs,
       round(avg(v), 4) AS mean,
       round(stddev_samp(v), 4) AS std,
       round(min(v), 4) AS min,
       round(quantile_cont(v, 0.25), 4) AS p25,
       round(quantile_cont(v, 0.50), 4) AS p50,
       round(quantile_cont(v, 0.75), 4) AS p75,
       round(max(v), 4) AS max
FROM per_doc GROUP BY tag
"""


def q_extract_br_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third production config (boilerplate_strip_br): <br> becomes a
    literal newline and its span is dropped (reference:
    parse_scripts/parse_natural_questions_Toy_keep_everything.py:57-105;
    pinned offsets: L1 = len('Line one')."""
    docs = _docs(spark, sf_dir)
    inter = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.concat(
                    F.lit("<html><body><p>Line one<br>"),
                    F.col("text"),
                    F.lit("</p></body></html>"),
                ).alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    ext = extract_documents(inter, "boilerplate_strip_br")
    return explode_spans(ext).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "tag", "char_start_idx", "relative_start_pos",
        "char_end_idx", "relative_end_pos", "offset",
    )


ORACLE_BR_CONVERSION = """
WITH base AS (
  SELECT doc_id, CAST(length(text) AS INTEGER) AS t FROM documents
)
SELECT doc_id, 'body' AS tag,
       CAST(0 AS INTEGER) AS char_start_idx, CAST(0 AS INTEGER) AS relative_start_pos,
       CAST(8 + t + 2 AS INTEGER) AS char_end_idx, CAST(0 AS INTEGER) AS relative_end_pos,
       CAST(0 AS INTEGER) AS offset FROM base
UNION ALL
SELECT doc_id, 'p', 0, 1, 8 + t + 1, 0, 1 FROM base
"""


def q_extract_config_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keep_everything vs boilerplate_strip on the same documents:
    the strip config removes script/footer subtrees (their text and
    spans), keep_everything linearizes them."""
    docs = _docs(spark, sf_dir)
    html = F.concat(
        F.lit("<html><body><p>"), F.col("text"),
        F.lit("</p><script>var x=1;</script><footer>foot</footer></body></html>"),
    )
    inter = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(F.struct(
            F.lit("html").alias("kind"), html.alias("text"),
            F.lit("").alias("media_ref"), F.lit(0).alias("offset"),
        )).alias("spans"),
    )
    out = None
    for cfg in ("keep_everything", "boilerplate_strip"):
        ext = extract_documents(inter, cfg).select(
            F.lit(cfg).alias("config"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "n_spans",
            "n_chars",
            F.col("malformed").cast("int").alias("malformed"),
        )
        out = ext if out is None else out.unionByName(ext)
    return out


ORACLE_CONFIG_COMPARISON = """
WITH base AS (SELECT doc_id, length(text) AS t FROM documents)
SELECT 'keep_everything' AS config, doc_id,
       CAST(4 AS INTEGER) AS n_spans,
       CAST(t + 15 AS BIGINT) AS n_chars,
       CAST(0 AS INTEGER) AS malformed
FROM base
UNION ALL
SELECT 'boilerplate_strip', doc_id, 2, t + 1, 0 FROM base
"""


# =========================================================================
# Relational operators (B9–B23)
# =========================================================================

def q_agg_median_by_lang(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.round(F.median("n_chars"), 6).alias("median_chars"),
            F.round(F.stddev("n_chars"), 6).alias("std_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


ORACLE_AGG_MEDIAN = """
SELECT lang, count(*) AS n_docs,
       round(avg(n_chars), 6) AS avg_chars,
       round(median(n_chars), 6) AS median_chars,
       round(stddev_samp(n_chars), 6) AS std_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY lang
"""


def q_describe_two_level(spark, sf_dir):
    per_group = (
        _docs(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(F.avg("n_chars").alias("grp_mean"))
    )
    return per_group.groupBy("lang").agg(
        F.count("grp_mean").alias("n_groups"),
        F.round(F.avg("grp_mean"), 6).alias("mean"),
        F.round(F.stddev("grp_mean"), 6).alias("std"),
        F.round(F.min("grp_mean"), 6).alias("min"),
        F.round(F.percentile("grp_mean", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("grp_mean", F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile("grp_mean", F.lit(0.75)), 6).alias("p75"),
        F.round(F.max("grp_mean"), 6).alias("max"),
    )


ORACLE_DESCRIBE_TWO_LEVEL = """
WITH per_group AS (
  SELECT lang, source, avg(n_chars) AS grp_mean
  FROM documents GROUP BY lang, source
)
SELECT lang, count(grp_mean) AS n_groups,
       round(avg(grp_mean), 6) AS mean,
       round(stddev_samp(grp_mean), 6) AS std,
       round(min(grp_mean), 6) AS min,
       round(quantile_cont(grp_mean, 0.25), 6) AS p25,
       round(quantile_cont(grp_mean, 0.50), 6) AS p50,
       round(quantile_cont(grp_mean, 0.75), 6) AS p75,
       round(max(grp_mean), 6) AS max
FROM per_group GROUP BY lang
"""


def q_explode_tokens_topk(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


ORACLE_EXPLODE_TOKENS = """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
"""


def q_filter_topk(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .filter((F.col("lang") == "en") & (F.col("n_chars") > 200))
        .select("doc_id", "source", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(100)
    )


ORACLE_FILTER_TOPK = """
SELECT doc_id, source, n_chars FROM documents
WHERE lang = 'en' AND n_chars > 200
ORDER BY n_chars DESC, doc_id ASC LIMIT 100
"""


def q_derived_columns(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = F.size(F.split(F.trim("text"), " "))
    return docs.select(
        "doc_id",
        (F.col("n_chars") - toks + 1).cast("bigint").alias("alpha_chars"),
        F.round(F.col("n_chars") / toks, 6).alias("chars_per_token"),
        (F.col("n_chars") % 7).cast("bigint").alias("bucket7"),
    )


ORACLE_DERIVED = """
SELECT doc_id,
       CAST(n_chars - len(string_split(trim(text), ' ')) + 1 AS BIGINT) AS alpha_chars,
       round(n_chars / len(string_split(trim(text), ' ')), 6) AS chars_per_token,
       CAST(n_chars % 7 AS BIGINT) AS bucket7
FROM documents
"""


def q_substring_span_join(spark, sf_dir):
    """B15: span→doc association as a real broadcast equi-join."""
    docs = _docs(spark, sf_dir)
    dim = docs.groupBy("lang").agg(F.avg("n_chars").alias("lang_avg"))
    return (
        docs.join(F.broadcast(dim), "lang")
        .select(
            "doc_id", "lang",
            F.substring("text", 1, 40).alias("head40"),
            F.round(F.col("n_chars") / F.col("lang_avg"), 6).alias("rel_len"),
        )
    )


ORACLE_SUBSTRING_JOIN = """
WITH dim AS (SELECT lang, avg(n_chars) AS lang_avg FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, substring(d.text, 1, 40) AS head40,
       round(d.n_chars / dim.lang_avg, 6) AS rel_len
FROM documents d JOIN dim USING (lang)
"""


def q_sample_exact_n(spark, sf_dir):
    return sampling.sample_exact_n(_docs(spark, sf_dir), 500, seed=42).select(
        "doc_id", "lang", "n_chars"
    )


ORACLE_SAMPLE = """
SELECT doc_id, lang, n_chars FROM documents
ORDER BY md5(CAST(doc_id AS VARCHAR) || '#42') ASC, doc_id ASC LIMIT 500
"""


def q_row_number_enumerate(spark, sf_dir):
    out = sampling.enumerate_rows(_docs(spark, sf_dir), "lang", "doc_id")
    return out.filter(F.col("row_idx") < 10).select("lang", "doc_id", "row_idx")


ORACLE_ROW_NUMBER = """
SELECT lang, doc_id, row_idx FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1 AS row_idx
  FROM documents
) WHERE row_idx < 10
"""


def q_union_accumulate(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    en = docs.filter(F.col("lang") == "en")
    fr = docs.filter(F.col("lang") == "fr")
    return en.unionByName(fr).groupBy("source").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("chars")
    )


ORACLE_UNION = """
SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars FROM (
  SELECT * FROM documents WHERE lang = 'en'
  UNION ALL SELECT * FROM documents WHERE lang = 'fr'
) GROUP BY source
"""
# ^ CAST: DuckDB sum(BIGINT) yields HUGEINT (int128), which the
#   driver's value normalizer renders differently from Spark's BIGINT
#   even though the numbers are equal (round-1 hash_match=false).


def q_null_fill_coalesce(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            F.coalesce(F.nullif(F.col("source"), F.lit("src0")), F.lit("fallback")).alias("src")
        )
        .groupBy("src")
        .agg(F.count("*").alias("n"))
    )


ORACLE_NULL_FILL = """
SELECT coalesce(nullif(source, 'src0'), 'fallback') AS src, count(*) AS n
FROM documents GROUP BY src
"""


def q_cast_rename_project(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        F.col("doc_id").alias("id"),
        F.col("n_chars").cast("double").alias("chars_f"),
        F.upper(F.col("lang")).alias("lang_uc"),
    )


ORACLE_CAST_RENAME = """
SELECT doc_id AS id, CAST(n_chars AS DOUBLE) AS chars_f, upper(lang) AS lang_uc
FROM documents
"""


# =========================================================================
# Dedup / similarity / text analysis / multimodal
# =========================================================================

def _dup_corpus(spark, sf_dir):
    """documents ∪ copies of a deterministic 10% slice → known dups."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return docs.unionByName(copies)


def q_dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_dup_corpus(spark, sf_dir)).select(
        "content_hash", "keep_id", "n_copies"
    )


ORACLE_DEDUP_EXACT = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
)
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
FROM corpus GROUP BY md5(text) HAVING count(*) > 1
"""


def q_dedup_paragraphs(spark, sf_dir):
    """Paragraph-level first-occurrence dedup (round 6, RefinedWeb
    line dedup): the dup corpus (documents ∪ a 10% copy slice) gets a
    deterministic line structure (every ``' table '`` becomes a
    newline — plain left-to-right string replace, identical in both
    engines), then every line keeps only its globally FIRST
    ``(doc_id, pos)`` occurrence.  The planted copies lose all their
    lines to the originals; originals can also lose lines that repeat
    earlier in the corpus — the oracle states the same seniority rule
    relationally."""
    corpus = _dup_corpus(spark, sf_dir).select(
        "doc_id", F.replace(F.col("text"), F.lit(" table "), F.lit("\n")).alias("text")
    )
    return dedup.dedup_paragraphs(corpus).select(
        "doc_id", "text", "n_kept", "n_dropped"
    )


ORACLE_DEDUP_PARAGRAPHS = """
WITH corpus AS (
  SELECT doc_id, replace(text, ' table ', chr(10)) AS text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, replace(text, ' table ', chr(10)) FROM documents
  WHERE doc_id % 10 = 0
), paras AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS para,
         generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos
  FROM corpus
), nz AS (
  SELECT * FROM paras WHERE length(trim(para)) > 0
), flagged AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) = 1
           AS keep
  FROM nz
)
SELECT doc_id,
       coalesce(string_agg(para, chr(10) ORDER BY pos) FILTER (keep), '')
         AS text,
       count(*) FILTER (keep) AS n_kept,
       count(*) FILTER (NOT keep) AS n_dropped
FROM flagged GROUP BY doc_id
"""


def q_dedup_neardup_incremental(spark, sf_dir):
    """Incremental NEAR-dup ingestion (round 6): a batch of recrawls
    (10% slice with every space doubled — md5(text) differs, shingle
    set identical) plus genuinely new docs is deduped against the
    corpus at θ=1.0 (shingle-set fingerprint anti-join — the
    maintainable-summary path of dedup.neardup_against).  Exact-text
    dedup_against would keep every recrawl; the near-dup path drops
    them all and keeps exactly the novel docs, which is what the
    oracle derives with the same fingerprint construction."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    recrawls = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.replace(F.col("text"), F.lit(" "), F.lit("  ")).alias("text"),
    )
    novel = docs.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(
            F.lit("novel"), F.col("doc_id"),
            F.lit(" alpha"), F.col("doc_id"),
            F.lit(" beta"), F.col("doc_id"),
            F.lit(" gamma"), F.col("doc_id"),
        ).alias("text"),
    )
    batch = recrawls.unionByName(novel)
    out = dedup.neardup_against(batch, corpus_df=docs, threshold=1.0)
    return out.select("doc_id", "text")


# DuckDB mirror of dedup.shingle_fingerprint over 3-gram shingles
_FP_SQL = r"""md5(array_to_string(list_transform(list_sort(list_distinct(
  list_transform(
    range(0, greatest(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 1),
    i -> array_to_string(list_slice(string_split_regex(trim(text), '\s+'), i + 1, i + 3), ' ')
  )
)), s -> md5(s)), '|'))"""

ORACLE_NEARDUP_INCREMENTAL = f"""
WITH corpusfp AS (
  SELECT DISTINCT {_FP_SQL} AS fp FROM documents
), batch AS (
  SELECT doc_id + 1000000 AS doc_id, replace(text, ' ', '  ') AS text
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  -- the Spark select references the PRE-alias doc_id inside concat,
  -- so the text embeds the ORIGINAL id
  SELECT doc_id + 2000000 AS doc_id,
         'novel' || doc_id || ' alpha' || doc_id
           || ' beta' || doc_id || ' gamma' || doc_id AS text
  FROM documents WHERE doc_id % 10 = 5
), bfp AS (
  SELECT doc_id, text, {_FP_SQL} AS fp FROM batch
), keep AS (
  SELECT fp, min(doc_id) AS doc_id FROM bfp GROUP BY fp
), wb AS (
  SELECT b.doc_id, b.text, b.fp FROM bfp b
  JOIN keep k ON b.doc_id = k.doc_id AND b.fp = k.fp
)
SELECT doc_id, text FROM wb ANTI JOIN corpusfp USING (fp)
"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard duplicates at threshold 1.0 — dispatches to the
    exact shingle-set-fingerprint fast path (Jaccard 1.0 ⇔ identical
    shingle sets), which is the oracle's own O(n) shape.  The MinHash
    θ<1 path is exercised by dedup_minhash_candidates (driver oracle)
    and the 0.8-threshold pytest (its oracle would be an O(n²)
    pairwise scan)."""
    corpus = _dup_corpus(spark, sf_dir)
    return dedup.jaccard_duplicates(corpus, threshold=1.0).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


ORACLE_NGRAM_JACCARD = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
), sh AS (
  SELECT doc_id,
         -- per-shingle md5 before the join: '|' inside tokens can't
         -- make distinct sets serialize alike (mirrors
         -- exact_shingle_duplicates)
         md5(array_to_string(list_transform(list_sort(list_distinct(
           list_transform(
             range(0, greatest(len(string_split_regex(trim(text), '\\s+')) - 3, 0) + 1),
             i -> array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), i + 1, i + 3), ' ')
           )
         )), s -> md5(s)), '|')) AS fp
  FROM corpus
), g AS (
  SELECT doc_id, fp,
         count(*) OVER (PARTITION BY fp) AS bsz,
         min(doc_id) OVER (PARTITION BY fp) AS rep
  FROM sh
)
-- mirrors _bucket_pairs: groups <= 128 emit all pairs; larger groups
-- emit min-id -> member star edges (lossless, O(d) not O(d^2))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(1.0 AS DOUBLE) AS jaccard
FROM g a JOIN g b ON a.fp = b.fp AND a.doc_id < b.doc_id
WHERE a.bsz <= 128
UNION ALL
SELECT rep AS id_a, doc_id AS id_b, CAST(1.0 AS DOUBLE) AS jaccard
FROM g WHERE bsz > 128 AND doc_id <> rep
"""


def _disjoint_dup_corpus(spark, sf_dir):
    """_dup_corpus variant whose DISTINCT documents share no tokens:
    every token is prefixed with its source doc's id, so distinct docs
    have disjoint shingle sets and near-independent token-hash sets,
    while planted copies (doc_id + 1e6, same text) stay identical.

    This makes the approximate operators exactly checkable: identical
    docs are guaranteed candidates (identical signatures → identical
    buckets), and a false positive would need a 64-bit hash collision
    across disjoint inputs (P ≈ 2⁻⁶⁴ per pair — never observed), so
    the expected output IS the planted-pair list."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    salted = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.transform(
                F.split(F.trim("text"), bpe.WS_RE),
                lambda t: F.concat(F.col("doc_id").cast("string"), F.lit(":"), t),
            ),
        ).alias("text"),
    )
    copies = salted.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return salted.unionByName(copies)


def q_dedup_minhash_candidates(spark, sf_dir):
    """The approximate LSH stage alone, oracle-checked on planted
    duplicates over the token-disjoint corpus (recall provably 1.0,
    precision provably 1.0 — see _disjoint_dup_corpus)."""
    return dedup.minhash_lsh_candidates(_disjoint_dup_corpus(spark, sf_dir)).select(
        "id_a", "id_b"
    )


ORACLE_MINHASH_CANDIDATES = """
SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
FROM documents WHERE doc_id % 10 = 0
"""


def q_dedup_simhash(spark, sf_dir):
    """SimHash ≤3-bit near-dup pairs on the token-disjoint corpus:
    planted copies have hamming 0 (guaranteed emitted via the 16-bit
    block pigeonhole), distinct docs have near-independent 64-bit
    signatures (P[hamming ≤ 3] ≈ 2.4e-15 per pair), so the output is
    exactly the planted pairs."""
    sigs = dedup.simhash(_disjoint_dup_corpus(spark, sf_dir))
    return dedup.simhash_candidates(sigs).select("id_a", "id_b", "hamming")


ORACLE_SIMHASH = """
SELECT doc_id AS id_a, doc_id + 1000000 AS id_b, CAST(0 AS INTEGER) AS hamming
FROM documents WHERE doc_id % 10 = 0
"""


def q_dedup_clusters(spark, sf_dir):
    """Connected-component duplicate clusters over the planted
    token-disjoint corpus: exact-duplicate candidate edges form one
    2-node cluster per planted copy (distinct docs share no tokens, so
    organic identical-shingle-set pairs are impossible — at sf0.1 the
    raw corpus DOES contain 8 organic duplicate-text groups, which is
    why the closed-form oracle needs the disjoint variant), so the
    expected (doc_id, cluster_id) table is closed-form."""
    corpus = _disjoint_dup_corpus(spark, sf_dir)
    edges = dedup.exact_shingle_duplicates(corpus).select("id_a", "id_b")
    return dedup.dedup_clusters(edges)


ORACLE_DEDUP_CLUSTERS = """
SELECT doc_id, doc_id AS cluster_id FROM documents WHERE doc_id % 10 = 0
UNION ALL
SELECT doc_id + 1000000 AS doc_id, doc_id AS cluster_id
FROM documents WHERE doc_id % 10 = 0
"""


_SHARED_PASSAGE = " ".join(f"passage{i:02d}" for i in range(24))


def _passage_corpus(spark, sf_dir):
    """Token-disjoint corpus (cf. _disjoint_dup_corpus) with a fixed
    24-token passage APPENDED to every ``doc_id % 10 == 0`` document.
    Salting makes every organic token unique to its doc, so the ONLY
    cross-doc k-grams are the windows fully inside the planted
    passage: junction windows carry a doc-salted token and cannot
    recur elsewhere.  The duplicated-passage output is therefore
    provably one interval per planted doc —
    ``[n_salted_tokens, n_salted_tokens + 24)`` — at any scale factor
    (the closed form survives sf0.1's organic duplicate texts because
    those are salted apart; see planted-oracle scale note)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    salted = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.transform(
                F.split(F.trim("text"), bpe.WS_RE),
                lambda t: F.concat(F.col("doc_id").cast("string"), F.lit(":"), t),
            ),
        ).alias("text"),
    )
    return salted.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.col("text"), F.lit(" " + _SHARED_PASSAGE)),
        ).otherwise(F.col("text")).alias("text"),
    )


def q_dedup_substring(spark, sf_dir):
    """Substring-level exact dedup (Lee et al. 2022): maximal ≥k-token
    passages duplicated ACROSS documents, as per-doc token intervals.
    k-gram fingerprint → cross-doc groupBy → island merge; see
    dedup.duplicated_passages for the 100-TB shape (no pair emission,
    three linear shuffles)."""
    return dedup.duplicated_passages(_passage_corpus(spark, sf_dir), k=8).select(
        "doc_id", "tok_start", "tok_end", "n_tokens"
    )


ORACLE_DEDUP_SUBSTRING = r"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '[ \t\n\r\f\x0b]+')) AS INT)
         AS tok_start,
       CAST(len(string_split_regex(trim(text), '[ \t\n\r\f\x0b]+')) + 24 AS INT)
         AS tok_end,
       CAST(24 AS INT) AS n_tokens
FROM documents WHERE doc_id % 10 = 0
"""


def q_dedup_substring_removal(spark, sf_dir):
    """The removal step (Lee et al. keep-one policy): every planted
    doc except the global minimum (doc_id 0) loses its shared-passage
    suffix; doc 0's occurrence survives; all other text is preserved
    token-exactly.  Closed form because min(gram→doc) is doc 0 for
    every in-passage gram."""
    return dedup.remove_duplicated_passages(
        _passage_corpus(spark, sf_dir), k=8
    ).select("doc_id", "text_clean", "n_removed_tokens")


# salted text = every token prefixed "doc_id:"; planted docs other
# than doc 0 lose the 24-token suffix, doc 0 keeps it
ORACLE_DEDUP_SUBSTRING_REMOVAL = r"""
WITH salted AS (
  SELECT doc_id,
         array_to_string(list_transform(
           string_split_regex(trim(text), '[ \t\n\r\f\x0b]+'),
           t -> CAST(doc_id AS VARCHAR) || ':' || t), ' ') AS base
  FROM documents
)
SELECT doc_id,
       CASE WHEN doc_id = 0 THEN base || ' ' ||
         'passage00 passage01 passage02 passage03 passage04 passage05 passage06 passage07 passage08 passage09 passage10 passage11 passage12 passage13 passage14 passage15 passage16 passage17 passage18 passage19 passage20 passage21 passage22 passage23'
       ELSE base END AS text_clean,
       CAST(CASE WHEN doc_id % 10 = 0 AND doc_id <> 0 THEN 24 ELSE 0 END
            AS INT) AS n_removed_tokens
FROM salted
"""


def q_dedup_incremental(spark, sf_dir):
    """Incremental ingestion dedup: a synthetic 'new crawl batch'
    (exact copies of every doc_id%3==0 doc + genuinely-new variants
    of every doc_id%3==1 doc) deduped against the corpus — copies
    dropped, fresh content kept.  Full-semantics oracle (within-batch
    keep-min window + md5 anti-join), robust to sf0.1's organic
    duplicate texts."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    fresh = docs.filter(F.col("doc_id") % 3 == 1).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.concat("text", F.lit(" fresh")).alias("text"),
    )
    batch = copies.unionByName(fresh)
    return dedup.dedup_against(batch, docs).select("doc_id", "text")


def q_dedup_incremental_bloom(spark, sf_dir):
    """Bloom-prefiltered incremental ingestion dedup (round 5): the
    same planted batch as dedup_incremental, routed through
    dedup_against_bloom — the corpus is summarized into a broadcast
    bitmap and the exact md5 anti-join runs only over bloom-positive
    candidates.  Bloom has no false negatives and the md5 join
    supplies exactness, so the survivor set is PROVABLY identical to
    the plain anti-join and the same closed-form oracle checks this
    path (the daily-ingest O(batch) shape for a 100-TB corpus)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    fresh = docs.filter(F.col("doc_id") % 3 == 1).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.concat("text", F.lit(" fresh")).alias("text"),
    )
    batch = copies.unionByName(fresh)
    return dedup.dedup_against_bloom(batch, docs).select("doc_id", "text")


ORACLE_DEDUP_INCREMENTAL = """
WITH newb AS (
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, text || ' fresh' AS text
  FROM documents WHERE doc_id % 3 = 1
), within AS (
  SELECT doc_id, text,
         min(doc_id) OVER (PARTITION BY md5(text)) AS keep
  FROM newb
)
SELECT doc_id, text FROM within
WHERE doc_id = keep
  AND md5(text) NOT IN (SELECT md5(text) FROM documents)
"""


def q_similarity_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.brute_force_topk(emb, qvec, k=10)


ORACLE_SIMILARITY = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) AS cosine
FROM embeddings
ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""


def q_similarity_batch_topk(spark, sf_dir):
    """Batched exact retrieval (round 5): three query vectors drawn
    from the corpus itself score the whole embeddings table in ONE
    pass (broadcast query batch + slim rank window) — the production
    serving/hard-negative-mining shape; calling the single-query
    operator Q times would rescan the corpus Q times.  Tie order
    (cosine DESC, vec_id ASC on the 6-dp rounded value) matches the
    single-query operator, so the oracle is a plain window."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id").isin(1, 5, 9)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.batch_topk(emb, qs, k=5)
    return out.select("query_id", "vec_id", "cosine")


ORACLE_SIMILARITY_BATCH = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN (1, 5, 9)
), s AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
           AS cosine
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rk
  FROM s
)
SELECT query_id, vec_id, cosine FROM r WHERE rk <= 5
"""


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (round 6): seeded-centroid clustering (k=8 lowest-id
    vectors) + intra-cluster cosine retraction.  The 0.3 threshold is
    calibrated to the synthetic embedding corpus (its max intra-
    cluster pair cosine is ~0.49; the paper's 0.95+ applies to real
    encoder output and is the operator default).  The oracle
    re-derives the identical clustering and pair scan in SQL — same
    rounded-cosine argmax, same lower-id-survivor rule."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = similarity.semantic_dedup(emb, k=8, threshold=0.3)
    return out.select("vec_id", "cluster_id", "keep")


ORACLE_SEMANTIC_DEDUP = """
WITH cent AS (
  SELECT vec_id AS cluster_id, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings ORDER BY vec_id LIMIT 8
), assigned AS (
  SELECT e.vec_id, c.cluster_id, CAST(e.embedding AS DOUBLE[]) AS v,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(
                      CAST(e.embedding AS DOUBLE[]), c.cvec), 6) DESC,
                    c.cluster_id ASC) AS rn
  FROM embeddings e CROSS JOIN cent c
), a AS (
  SELECT vec_id, cluster_id, v FROM assigned WHERE rn = 1
), dups AS (
  SELECT DISTINCT b.vec_id
  FROM a x JOIN a b ON x.cluster_id = b.cluster_id AND x.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(x.v, b.v), 6) >= 0.3
)
SELECT a.vec_id, a.cluster_id, (d.vec_id IS NULL) AS keep
FROM a LEFT JOIN dups d ON a.vec_id = d.vec_id
"""


def q_similarity_lsh(spark, sf_dir):
    """ANN top-k with planted neighbors: 10 exact copies of the query
    vector (vec_id 1e6..1e6+9).  Identical vectors land in the query's
    own LSH bucket, so the ANN result provably equals the brute-force
    top-10 — which the oracle computes over the same corpus.  (General
    recall vs brute force is additionally asserted in pytest.)"""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    id_type = emb.schema["vec_id"].dataType.simpleString()
    copies = (
        emb.filter(F.col("vec_id") == 0)
        .select(
            F.explode(F.sequence(F.lit(1_000_000), F.lit(1_000_009))).alias("copy_id"),
            "embedding",
        )
        .select(F.col("copy_id").cast(id_type).alias("vec_id"), "embedding")
    )
    return similarity.lsh_topk(emb.unionByName(copies), qvec, k=10)


ORACLE_SIMILARITY_LSH = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT 1000000 + t.i, embedding FROM embeddings, range(10) t(i) WHERE vec_id = 0
)
SELECT vec_id,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) AS cosine
FROM corpus
ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""


def q_similarity_ivf(spark, sf_dir):
    """IVF ANN top-k with the same planted construction as
    similarity_lsh_topk: 10 exact copies of the query vector are
    k-means-assigned to the query's own list, so probing the nearest
    lists provably returns the brute-force top-10 (n_probe=2 covers
    float-tie disagreement between the driver-side and MLlib argmin)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    id_type = emb.schema["vec_id"].dataType.simpleString()
    copies = (
        emb.filter(F.col("vec_id") == 0)
        .select(
            F.explode(F.sequence(F.lit(1_000_000), F.lit(1_000_009))).alias("copy_id"),
            "embedding",
        )
        .select(F.col("copy_id").cast(id_type).alias("vec_id"), "embedding")
    )
    return similarity.ivf_topk(
        emb.unionByName(copies), qvec, k=10, n_centroids=8, n_probe=2
    )


def q_similarity_pq(spark, sf_dir):
    """Product-quantization ANN with planted neighbors: 10 exact
    copies of the query vector encode to the query's own PQ code, so
    their ADC distance is the global minimum any code can achieve —
    the top-11 is provably the query + its copies (ids tie-break).
    At m=8/k=32 the code space is 32⁸ ≈ 10¹², so no organic vector
    shares the cell.  Output is the id set (ADC distances are not
    SQL-expressible; recall vs brute force is asserted in pytest)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    id_type = emb.schema["vec_id"].dataType.simpleString()
    copies = (
        emb.filter(F.col("vec_id") == 0)
        .select(
            F.explode(F.sequence(F.lit(1_000_000), F.lit(1_000_009))).alias("copy_id"),
            "embedding",
        )
        .select(F.col("copy_id").cast(id_type).alias("vec_id"), "embedding")
    )
    corpus = emb.unionByName(copies)
    books = similarity.pq_train(corpus, m=8, k=32)
    return similarity.pq_topk(corpus, books, qvec, k=11).select("vec_id")


ORACLE_SIMILARITY_PQ = """
SELECT CAST(0 AS BIGINT) AS vec_id
UNION ALL
SELECT CAST(1000000 + t.i AS BIGINT) FROM range(10) t(i)
"""


def q_similarity_sq8_topk(spark, sf_dir):
    """Scalar int8 quantization retrieval (round 6, FAISS
    ScalarQuantizer shape): the corpus is encoded to per-vector-scaled
    int8 codes (4× less scan I/O than float32) and scored
    asymmetrically against the float query — the scale cancels out of
    the cosine, so scoring reads only the codes and stays in codegen.
    Ten exact copies of the query quantize to its own codes (identical
    cosine, ids tie-break), while SQ8's ~1e-5 cosine error keeps every
    organic vector strictly below them — the top-11 is provably the
    query + its copies (pytest additionally pins recall vs the exact
    float path)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    id_type = emb.schema["vec_id"].dataType.simpleString()
    copies = (
        emb.filter(F.col("vec_id") == 0)
        .select(
            F.explode(F.sequence(F.lit(1_000_000), F.lit(1_000_009))).alias("copy_id"),
            "embedding",
        )
        .select(F.col("copy_id").cast(id_type).alias("vec_id"), "embedding")
    )
    corpus = emb.unionByName(copies)
    codes = similarity.sq8_encode(corpus)
    return similarity.sq8_topk(codes, qvec, k=11).select("vec_id")


ORACLE_SIMILARITY_SQ8 = """
SELECT CAST(0 AS BIGINT) AS vec_id
UNION ALL
SELECT CAST(1000000 + t.i AS BIGINT) FROM range(10) t(i)
"""


def q_similarity_ivfpq(spark, sf_dir):
    """IVF-PQ ANN (the FAISS IndexIVFPQ composition — VERDICT r3 #6):
    coarse lists prune the scan, residual PQ codes compress it.  The
    planted construction composes both sub-oracles: 10 exact copies of
    the query share its k-means list (IVF guarantee) and encode to its
    exact residual code (that list's ADC floor — PQ guarantee), so the
    top-11 is provably the query + its copies.  m=8/k=32 leaves the
    per-list code space at 32⁸ ≈ 10¹² — no organic vector shares the
    cell.  Output is the id set (ADC distances are not
    SQL-expressible; recall vs brute force is asserted in pytest)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    id_type = emb.schema["vec_id"].dataType.simpleString()
    copies = (
        emb.filter(F.col("vec_id") == 0)
        .select(
            F.explode(F.sequence(F.lit(1_000_000), F.lit(1_000_009))).alias("copy_id"),
            "embedding",
        )
        .select(F.col("copy_id").cast(id_type).alias("vec_id"), "embedding")
    )
    corpus = emb.unionByName(copies)
    return similarity.ivfpq_topk(
        corpus, qvec, k=11, n_centroids=8, n_probe=2, m=8, k_codes=32
    ).select("vec_id")


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup detection with planted duplicate
    vectors (vec_id + 1e6).  Identical vectors share every LSH bucket
    bit, so recall is exact at cosine=1.0 and the oracle is the
    planted-pair list (organic pairs never reach 0.999 on this data)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(copies)
    return similarity.embedding_near_duplicates(corpus, threshold=0.999)


ORACLE_EMBEDDING_NEAR_DUPS = """
SELECT vec_id AS id_a, vec_id + 1000000 AS id_b, CAST(1.0 AS DOUBLE) AS cosine
FROM embeddings WHERE vec_id % 10 = 0
"""


def q_gopher_rules(spark, sf_dir):
    """The published Gopher document-quality rules (Rae et al. 2021
    §A1.1) as one zero-shuffle codegen projection; the oracle
    replicates every metric term-for-term (word/line fractions,
    symbol ratio, stopword presence).  The operator defaults to the
    paper's web-document thresholds; this query tunes two of them to
    the synthetic corpus (shorter docs, sparse English stopwords) so
    the verdict is a real mix — 334 pass / 166 fail at sf0.01 —
    instead of a constant column."""
    out = text_analysis.gopher_quality(
        _docs(spark, sf_dir), min_words=30, min_stop_hits=1
    )
    return out.select(
        "doc_id", "n_words", "mean_word_len", "symbol_word_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
        "stop_hits", "gopher_ok",
    )


ORACLE_GOPHER_RULES = r"""
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '[ \t\n\r\f\x0b]+') AS toks,
         string_split(text, chr(10)) AS lines
  FROM documents
), m AS (
  SELECT doc_id,
    len(toks) AS n_words,
    CASE WHEN len(toks) > 0 THEN
      round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
            / len(toks), 4)
    ELSE 0.0 END AS mean_word_len,
    CASE WHEN len(toks) > 0 THEN
      round(CAST(
        (length(text) - length(replace(text, '#', '')))
        + (length(text) - length(replace(text, '...', ''))) / 3
        + (length(text) - length(replace(text, '…', '')))
        AS BIGINT) / len(toks), 4)
    ELSE 0.0 END AS symbol_word_ratio,
    CASE WHEN len(lines) > 0 THEN
      round(CAST(len(list_filter(lines, l ->
          starts_with(trim(l), '•') OR starts_with(trim(l), '- ')
          OR starts_with(trim(l), '* '))) AS DOUBLE) / len(lines), 4)
    ELSE 0.0 END AS bullet_line_frac,
    CASE WHEN len(lines) > 0 THEN
      round(CAST(len(list_filter(lines, l ->
          ends_with(trim(l), '...') OR ends_with(trim(l), '…')))
        AS DOUBLE) / len(lines), 4)
    ELSE 0.0 END AS ellipsis_line_frac,
    CASE WHEN len(toks) > 0 THEN
      round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
        AS DOUBLE) / len(toks), 4)
    ELSE 0.0 END AS alpha_word_frac,
    CAST(
      (CASE WHEN contains(' ' || lower(text) || ' ', ' the ') THEN 1 ELSE 0 END)
      + (CASE WHEN contains(' ' || lower(text) || ' ', ' be ') THEN 1 ELSE 0 END)
      + (CASE WHEN contains(' ' || lower(text) || ' ', ' to ') THEN 1 ELSE 0 END)
      + (CASE WHEN contains(' ' || lower(text) || ' ', ' of ') THEN 1 ELSE 0 END)
      + (CASE WHEN contains(' ' || lower(text) || ' ', ' and ') THEN 1 ELSE 0 END)
      + (CASE WHEN contains(' ' || lower(text) || ' ', ' that ') THEN 1 ELSE 0 END)
      + (CASE WHEN contains(' ' || lower(text) || ' ', ' have ') THEN 1 ELSE 0 END)
      + (CASE WHEN contains(' ' || lower(text) || ' ', ' with ') THEN 1 ELSE 0 END)
      AS INT) AS stop_hits
  FROM t
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len,
       symbol_word_ratio, bullet_line_frac, ellipsis_line_frac,
       alpha_word_frac, stop_hits,
       (n_words >= 30 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_word_ratio <= 0.1
        AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3
        AND alpha_word_frac >= 0.8 AND stop_hits >= 1) AS gopher_ok
FROM m
"""


def q_dataset_card(spark, sf_dir):
    """Dataset-card statistics per source (the reporting table a
    curation pipeline publishes): docs, languages, token totals/means,
    exact-duplicate counts and rate.  ONE corpus scan: the first
    groupBy reduces to (source, lang, content-hash) partials, and
    every further step (global copy counts, the per-source rollup)
    operates on those small aggregated frames — a base-vs-dup_counts
    self-join would re-scan the table and recompute the full-text md5
    per branch (the CLAUDE.md computed-key self-join trap); a window
    over the hash would shuffle every copy of a hot text to one
    reducer."""
    from .operators import bpe

    docs = _docs(spark, sf_dir)
    base = docs.select(
        "source", "lang",
        F.md5("text").alias("h"),
        F.size(F.split(F.trim("text"), bpe.WS_RE)).alias("ntok"),
    )
    partial = base.groupBy("source", "lang", "h").agg(
        F.count("*").alias("n"), F.sum("ntok").alias("toks")
    )
    copies = partial.groupBy("h").agg(F.sum("n").alias("copies"))
    joined = partial.join(copies, "h")
    return (
        joined.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("toks").cast("bigint").alias("total_tokens"),
            F.round(F.sum("toks") / F.sum("n"), 4).cast("double").alias("avg_doc_tokens"),
            F.sum(F.when(F.col("copies") > 1, F.col("n")).otherwise(0))
            .cast("bigint").alias("n_dup_docs"),
        )
        .withColumn(
            "dup_rate",
            F.round(F.col("n_dup_docs") / F.col("n_docs"), 6).cast("double"),
        )
        .orderBy("source")
    )


ORACLE_DATASET_CARD = r"""
WITH base AS (
  SELECT source, lang, doc_id, md5(text) AS h,
         len(string_split_regex(trim(text), '[ \t\n\r\f\x0b]+')) AS ntok
  FROM documents
), dc AS (
  SELECT h, count(*) AS copies FROM base GROUP BY 1
)
SELECT b.source,
       count(*) AS n_docs,
       count(DISTINCT b.lang) AS n_langs,
       CAST(sum(b.ntok) AS BIGINT) AS total_tokens,
       round(avg(b.ntok), 4) AS avg_doc_tokens,
       CAST(sum(CASE WHEN dc.copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       round(CAST(sum(CASE WHEN dc.copies > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS dup_rate
FROM base b JOIN dc ON b.h = dc.h
GROUP BY b.source
ORDER BY b.source
"""


def q_url_filter(spark, sf_dir):
    """URL-level crawl curation (C4/RefinedWeb URL-filter stage):
    URLs synthesized relationally from (source, lang, doc_id) —
    subdomained hosts, varying path depth, query strings — then
    domain/tld/depth features + a blocklist dropping one source
    domain and every subdomain of another."""
    docs = _docs(spark, sf_dir)
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 4 == 0, F.concat(F.col("lang"), F.lit(".")))
            .otherwise(F.lit("")),
            F.col("source"), F.lit(".example.com/"),
            F.col("lang"), F.lit("/doc-"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("?ref=1")).otherwise(F.lit("")),
        ).alias("url"),
    )
    out = text_analysis.filter_url_blocklist(
        urls, ["src1.example.com", "src2.example.com"]
    )
    return out.select(
        "doc_id", "url", "domain", "tld", "path_depth", "has_query"
    )


ORACLE_URL_FILTER = """
WITH u AS (
  SELECT doc_id,
         'https://'
         || CASE WHEN doc_id % 4 = 0 THEN lang || '.' ELSE '' END
         || source || '.example.com/' || lang || '/doc-'
         || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 3 = 0 THEN '?ref=1' ELSE '' END AS url,
         CASE WHEN doc_id % 4 = 0 THEN lang || '.' ELSE '' END
         || source || '.example.com' AS domain
  FROM documents
)
SELECT doc_id, url, domain,
       'com' AS tld,
       CAST(2 AS INT) AS path_depth,
       (doc_id % 3 = 0) AS has_query
FROM u
WHERE NOT (domain = 'src1.example.com' OR domain LIKE '%.src1.example.com'
        OR domain = 'src2.example.com' OR domain LIKE '%.src2.example.com')
"""


def q_token_counts_gpt2(spark, sf_dir):
    """GPT-2-compatible byte-level BPE token counts (the reference's
    GPT2TokenizerFast surface, compute_aggregate_stats.py:25,62-64),
    oracle-checked on a PLANTED closed-form corpus (VERDICT r4 #1).

    The min-rank merge loop is not expressible as chained SQL
    replaces for arbitrary text, but a corpus built only from units
    whose tokenization under the embedded merge table is hand-derived
    makes the expected count a SQL expression.  Each doc's text is
    ``repeat(unit_i, doc_id % m_i)`` concatenated over five units
    chosen to cover every pretokenizer branch; units start with a
    space (or a 2-space run) and end with a non-space, so pretokens
    never merge across unit boundaries and counts are additive.
    Hand derivation against ILLUSTRATIVE_MERGES ranks (pinned
    independently in tests/test_gpt2_bpe.py::test_planted_unit_counts):

    - ``" the"``  → (h,e)r0 → (Ġ,t)r5 → (Ġt,he)r15 → ``Ġthe``: **1**
    - ``" hello"`` → (h,e)r0,(l,l)r27,(ll,o)r26,(he,llo)r28 →
      ``Ġ hello``: **2** (no Ġ+hello merge exists)
    - ``" it's"`` → pretokens ``" it"``+``"'s"`` (contraction branch);
      no merge touches (Ġ,i),(i,t),(',s) → **5**
    - ``" 123"`` → number branch, digits appear in no merge → **4**
    - ``"  zq!"`` → ws-run backtrack ``" "``+``" zq"``+``"!"``
      (symbol branch, no leading space) → **5**

    The Spark side runs the REAL tokenizer (bytes→unicode table,
    released-pattern pretokenizer, min-rank merge loop, Arrow-batched
    UDF) over the planted text; any defect in those stages breaks the
    value hash.  doc_id=0 plants the empty string (0 tokens).
    ``load_gpt2_merges(<public merges.txt>)`` swaps in exact GPT-2
    ranks for production use; exotic-text behavior is pinned by
    tests/test_gpt2_bpe.py (bijection, pretokenizer-vs-released-
    pattern, hand-computed merges)."""
    from .operators.gpt2_bpe import ILLUSTRATIVE_MERGES, gpt2_token_counts

    planted = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.expr("repeat(' the', CAST(doc_id % 7 AS INT))"),
            F.expr("repeat(' hello', CAST(doc_id % 5 AS INT))"),
            F.expr("repeat(\" it's\", CAST(doc_id % 3 AS INT))"),
            F.expr("repeat(' 123', CAST(doc_id % 4 AS INT))"),
            F.expr("repeat('  zq!', CAST(doc_id % 2 AS INT))"),
        ).alias("text"),
    )
    # the oracle's closed-form counts are derived for ILLUSTRATIVE
    # ranks — pin them explicitly so an env-installed production table
    # (gpt2_bpe.default_merges / vocab_tool import) can't shift the
    # planted counts out from under the hash
    out = gpt2_token_counts(planted, merges=ILLUSTRATIVE_MERGES)
    return out.select("doc_id", "gpt2_tokens")


ORACLE_TOKEN_COUNTS_GPT2 = """
SELECT doc_id,
       CAST((doc_id % 7) * 1 + (doc_id % 5) * 2 + (doc_id % 3) * 5
            + (doc_id % 4) * 4 + (doc_id % 2) * 5 AS BIGINT)
         AS gpt2_tokens
FROM documents
"""


def q_quality_classifier(spark, sf_dir):
    """Trainable quality classifier (fasttext-style logistic model
    over hashed token features — VERDICT r3 #7): planted separable
    marker tokens (3 per class, appended by doc_id parity) make the
    learned predictions provably the parity labels — organic tokens
    appear in both classes and train to ≈0 weight, while the fit is
    bit-deterministic (md5-ordered sample, zero-init full-batch GD,
    fixed iterations), so the closed-form oracle holds at any scale."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    labeled = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat("text", F.lit(" qgoodaa qgoodbb qgoodcc")),
        ).otherwise(
            F.concat("text", F.lit(" qbadaa qbadbb qbadcc"))
        ).alias("text"),
        (F.col("doc_id") % 2 == 0).cast("int").alias("label"),
    )
    weights = text_analysis.train_quality_classifier(labeled)
    out = text_analysis.quality_classify(labeled, weights)
    return out.select(
        "doc_id", F.col("quality_pred").cast("int").alias("pred_quality")
    )


ORACLE_QUALITY_CLASSIFIER = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS INT) AS pred_quality
FROM documents
"""


def q_lang_id(spark, sf_dir):
    out = text_analysis.language_id(_docs(spark, sf_dir))
    return out.groupBy("lang", "detected_lang").agg(F.count("*").alias("n"))


def _oracle_lang_scores() -> str:
    parts = []
    for lang, words in sorted(text_analysis.LANG_MARKERS.items()):
        terms = " + ".join(
            f"CAST((length(p.pt) - length(replace(p.pt, ' {w} ', ' '))) / {len(w) + 2 - 1} AS BIGINT)"
            for w in words
        )
        parts.append(f"({terms}) AS score_{lang}")
    return ", ".join(parts)


ORACLE_LANG_ID = f"""
WITH p AS (SELECT lang, ' ' || text || ' ' AS pt FROM documents),
scored AS (SELECT lang, {_oracle_lang_scores()} FROM p),
det AS (
  SELECT lang,
    CASE
      WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr AND score_de > 0 THEN 'de'
      WHEN score_en >= score_es AND score_en >= score_fr AND score_en > 0 THEN 'en'
      WHEN score_es >= score_fr AND score_es > 0 THEN 'es'
      WHEN score_fr > 0 THEN 'fr'
      ELSE 'und'
    END AS detected_lang
  FROM scored
)
SELECT lang, detected_lang, count(*) AS n FROM det GROUP BY lang, detected_lang
"""


def q_quality_scores(spark, sf_dir):
    out = text_analysis.quality_score(_docs(spark, sf_dir))
    return out.select(
        "doc_id", "n_tokens", "avg_token_len", "punct_ratio",
        F.col("quality_ok").cast("int").alias("quality_ok"),
    )


ORACLE_QUALITY = """
WITH t AS (
  SELECT doc_id, text, length(text) AS nc,
         len(string_split_regex(trim(text), '\\s+')) AS nt,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS np
  FROM documents
)
SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
       round((nc - nt + 1) / nt, 4) AS avg_token_len,
       round(np / nc, 4) AS punct_ratio,
       CAST(CASE WHEN nt >= 5 AND nc >= 20 AND np / nc < 0.2 THEN 1 ELSE 0 END AS INTEGER) AS quality_ok
FROM t
"""


def q_token_counts(spark, sf_dir):
    out = text_analysis.token_counts(_docs(spark, sf_dir))
    return out.select("doc_id", "ws_tokens", "bpe_ish_tokens")


ORACLE_TOKEN_COUNTS = """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f\x0b]')) AS BIGINT) AS bpe_ish_tokens
FROM documents
"""


def q_repetition_ratio(spark, sf_dir):
    """Intra-document repetition ratio (duplicate word-trigram
    fraction) — crawl-quality signal, pure codegen expressions."""
    out = text_analysis.repetition_ratio(_docs(spark, sf_dir))
    return out.select("doc_id", "repetition_ratio")


ORACLE_REPETITION = r"""
WITH g AS (
  SELECT doc_id,
         list_transform(
           range(0, greatest(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 1),
           i -> array_to_string(list_slice(string_split_regex(trim(text), '\s+'), i + 1, i + 3), ' ')
         ) AS grams
  FROM documents
)
SELECT doc_id,
       CAST(round(1.0 - len(list_distinct(grams)) / len(grams), 6) AS DOUBLE) AS repetition_ratio
FROM g
"""


def q_token_counts_bpe(spark, sf_dir):
    """Self-contained BPE subword token counts (reference B16 — the
    reference uses GPT-2 via transformers, offline-unavailable; this
    is the engine's embedded-vocab BPE).  Pure JVM expressions; the
    oracle replicates the identical merge passes in DuckDB."""
    from .operators import bpe

    return _docs(spark, sf_dir).select(
        "doc_id", bpe.bpe_token_count_col(F.col("text")).alias("bpe_tokens")
    )


def _oracle_token_counts_bpe() -> str:
    from .operators import bpe

    return (
        "SELECT doc_id, "
        + bpe.oracle_sql_expr("text")
        + " AS bpe_tokens FROM documents"
    )


def q_fingerprint(spark, sf_dir):
    out = text_analysis.fingerprint(_docs(spark, sf_dir))
    return out.select("doc_id", "fingerprint")


ORACLE_FINGERPRINT = """
SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
FROM documents
"""


def q_multimodal_features(spark, sf_dir):
    media = multimodal.attach_media_payload(_docs(spark, sf_dir))
    return multimodal.extract_media_features(media)


ORACLE_MULTIMODAL = """
WITH m AS (SELECT doc_id, octet_length(encode(text)) AS bl FROM documents)
SELECT doc_id, 'media://blob/' || CAST(doc_id AS VARCHAR) AS media_ref,
       CAST(bl AS BIGINT) AS byte_len,
       CASE bl % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
       CAST(64 + (bl % 97) * 4 AS INTEGER) AS width,
       CAST(64 + (bl * 7 % 89) * 4 AS INTEGER) AS height,
       CAST(1 + bl % 8 AS INTEGER) AS n_frames_sampled
FROM m
"""


def q_pipeline_media_features(spark, sf_dir):
    """Extraction × multimodal integration: the media spans the
    KERNEL emits for an interleaved corpus, joined by ``media_ref`` to
    the decoded media-feature table — the image side of a multimodal
    pretraining prep (every span knows its document position AND its
    pixel metadata).  Join key is the media ref string; both sides
    are one row per doc here, and at scale this is the hash join the
    media lakehouse serves."""
    docs = _docs(spark, sf_dir)
    inter = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.concat(F.lit("<html><body><p>"), F.col("text"), F.lit(" ")).alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                F.concat(F.lit("media://blob/"), F.col("doc_id").cast("string")).alias("media_ref"),
                F.lit(1).alias("offset"),
            ),
            F.struct(
                F.lit("html").alias("kind"),
                F.lit("</p></body></html>").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(2).alias("offset"),
            ),
        ).alias("spans"),
    )
    ext = extract_documents(inter, "keep_everything")
    media_spans = (
        explode_spans(ext)
        .filter(F.col("kind") == "media")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "media_ref",
            "char_start_idx",
        )
    )
    feats = multimodal.extract_media_features(
        multimodal.attach_media_payload(docs)
    ).select("media_ref", "width", "height", "format")
    return media_spans.join(feats, "media_ref").select(
        "doc_id", "media_ref", "char_start_idx", "width", "height", "format"
    )


ORACLE_PIPELINE_MEDIA = """
WITH m AS (
  SELECT doc_id, CAST(length(text) AS INTEGER) AS t,
         octet_length(encode(text)) AS bl
  FROM documents
)
SELECT doc_id, 'media://blob/' || CAST(doc_id AS VARCHAR) AS media_ref,
       CAST(t + 1 AS INTEGER) AS char_start_idx,
       CAST(64 + (bl % 97) * 4 AS INTEGER) AS width,
       CAST(64 + (bl * 7 % 89) * 4 AS INTEGER) AS height,
       CASE bl % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
FROM m
"""


def q_pipeline_clean_corpus(spark, sf_dir):
    """The end-to-end crawl-cleaning pipeline as ONE Catalyst plan:
    exact-dedup survivors → language-ID → quality gates → repetition
    gate → per-language corpus stats.  Composes only oracle-verified
    pieces; this is the query a training-data user actually runs."""
    docs = _docs(spark, sf_dir)
    survivors = dedup.exact_dedup(docs)
    lang = text_analysis.language_id(survivors)
    qual = text_analysis.quality_score(lang)
    rep = text_analysis.repetition_ratio(qual)
    # Materialization fence (r7): without it the optimizer pushes the
    # filter below the projection, inlining every derived column's
    # expression tree into the pushed condition — the 16 marker
    # replaces, ~8 split()s and the 3-gram zip/distinct then evaluate
    # TWICE per row (once in the pushed Filter, once in the Project
    # feeding the agg), and codegen subexpression elimination can't
    # recover the copies that sit inside conditional branches.  A slim
    # lazy localCheckpoint (6 narrow columns, no text) computes every
    # feature exactly once per run — nothing persists across
    # invocations (fresh lineage per call).  Measured 2.9 s → 1.8 s at
    # sf0.1; identical rows.
    slim = rep.select(
        "doc_id", "detected_lang", "n_tokens", "punct_ratio",
        "quality_ok", "repetition_ratio",
    ).localCheckpoint(eager=False)
    kept = slim.filter(
        (F.col("detected_lang") != "und")
        & F.col("quality_ok")
        & (F.col("repetition_ratio") < 0.5)
    )
    return kept.groupBy("detected_lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("punct_ratio"), 6).alias("avg_punct_ratio"),
    )


def _oracle_pipeline() -> str:
    from .operators.text_analysis import LANG_MARKERS  # noqa: F401 (parity anchor)

    scores = _oracle_lang_scores()
    return rf"""
WITH surv AS (
  SELECT d.* FROM documents d
  JOIN (SELECT md5(text) AS h, min(doc_id) AS keep FROM documents GROUP BY 1) k
    ON md5(d.text) = k.h AND d.doc_id = k.keep
),
p AS (SELECT doc_id, text, ' ' || text || ' ' AS pt FROM surv),
scored AS (SELECT doc_id, text, {scores} FROM p),
det AS (
  SELECT doc_id, text,
    CASE
      WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr AND score_de > 0 THEN 'de'
      WHEN score_en >= score_es AND score_en >= score_fr AND score_en > 0 THEN 'en'
      WHEN score_es >= score_fr AND score_es > 0 THEN 'es'
      WHEN score_fr > 0 THEN 'fr'
      ELSE 'und'
    END AS detected_lang
  FROM scored
),
q AS (
  SELECT doc_id, detected_lang, text,
         length(text) AS nc,
         len(string_split_regex(trim(text), '\s+')) AS nt,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS np
  FROM det
),
g AS (
  SELECT *,
         list_transform(
           range(0, greatest(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 1),
           i -> array_to_string(list_slice(string_split_regex(trim(text), '\s+'), i + 1, i + 3), ' ')
         ) AS grams
  FROM q
)
SELECT detected_lang, count(*) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS total_tokens,
       CAST(round(avg(round(np / nc, 4)), 6) AS DOUBLE) AS avg_punct_ratio
FROM g
WHERE detected_lang != 'und'
  AND nt >= 5 AND nc >= 20 AND np / nc < 0.2
  AND round(1.0 - len(list_distinct(grams)) / len(grams), 6) < 0.5
GROUP BY detected_lang
"""


def q_scrub_pii(spark, sf_dir):
    """PII scrub with planted emails/IPs/phones appended to every doc
    (the organic synthetic text has none), counts + redacted-text md5.
    The oracle replicates the staged redaction with identical
    patterns (Java-regex ∩ RE2 common subset)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(" tel +1555"), F.lpad(F.col("doc_id").cast("string"), 7, "0"),
        ).alias("text"),
    )
    out = text_analysis.scrub_pii(docs)
    return out.select(
        "doc_id", "n_email", "n_ip", "n_phone",
        F.md5("text_redacted").alias("redacted_md5"),
    )


def _oracle_scrub_pii() -> str:
    from .operators.text_analysis import PII_PATTERNS

    planted = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com at 10.0.0.' "
        "|| CAST(doc_id % 256 AS VARCHAR) || ' tel +1555' || lpad(CAST(doc_id AS VARCHAR), 7, '0')"
    )
    stages = [f"SELECT doc_id, {planted} AS t0 FROM documents"]
    counts = []
    for i, (name, pat, token) in enumerate(PII_PATTERNS):
        counts.append(
            f"CAST(len(regexp_extract_all(t{i}, '{pat}')) AS BIGINT) AS n_{name}"
        )
        stages.append(
            f"SELECT *, regexp_replace(t{i}, '{pat}', '{token}', 'g') AS t{i + 1} "
            f"FROM s{i}"
        )
    ctes = ", ".join(f"s{i} AS ({q})" for i, q in enumerate(stages))
    return (
        f"WITH {ctes} SELECT doc_id, {', '.join(counts)}, "
        f"md5(t{len(PII_PATTERNS)}) AS redacted_md5 FROM s{len(stages) - 1}"
    )


def q_multimodal_resize(spark, sf_dir):
    """Resize stage over the opaque payloads (decode stubbed, Spark
    plumbing real) — dims and payload length are deterministic
    functions of the byte length, so DuckDB replicates them exactly."""
    media = multimodal.attach_media_payload(_docs(spark, sf_dir))
    out = multimodal.resize_media(media, max_side=256)
    return out.select(
        "doc_id", "width", "height",
        F.octet_length("resized_payload").cast("long").alias("resized_bytes"),
    )


ORACLE_MULTIMODAL_RESIZE = """
WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
d AS (SELECT doc_id, n, 64 + (n % 97) * 4 AS w, 64 + (n * 7 % 89) * 4 AS h FROM m),
s AS (SELECT doc_id, n, w, h, least(1.0, 256.0 / greatest(w, h)) AS sc FROM d),
r AS (SELECT doc_id, n, w, h,
        greatest(1, CAST(floor(w * sc) AS INTEGER)) AS nw,
        greatest(1, CAST(floor(h * sc) AS INTEGER)) AS nh FROM s)
SELECT doc_id, CAST(nw AS INTEGER) AS width, CAST(nh AS INTEGER) AS height,
       CAST(CASE WHEN n = 0 THEN 0
                 ELSE greatest(1, CAST(floor(n * (nw * nh) / (w * h)) AS BIGINT))
            END AS BIGINT) AS resized_bytes
FROM r
"""


def q_multimodal_frames(spark, sf_dir):
    """Frame-sampling stage: 1→N mapInPandas rows, evenly spaced
    offsets — the stub analogue of video timestamp sampling."""
    media = multimodal.attach_media_payload(_docs(spark, sf_dir))
    out = multimodal.sample_frames(media, n_frames=4)
    return out.select(
        "doc_id", "frame_idx",
        F.octet_length("frame_payload").cast("long").alias("frame_bytes"),
    )


ORACLE_MULTIMODAL_FRAMES = """
WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
k AS (SELECT doc_id, n, least(4, greatest(1, n)) AS kf FROM m),
f AS (SELECT doc_id, n, kf, greatest(1, n // kf) AS step FROM k),
e AS (SELECT doc_id, n, step, unnest(range(kf)) AS i FROM f)
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       CAST(least(16, greatest(0, n - i * step)) AS BIGINT) AS frame_bytes
FROM e
"""


# =========================================================================
# Events (windowing) and TPC-H-ish joins
# =========================================================================

def q_events_window_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
    )


ORACLE_EVENTS_WINDOW = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
       count(*) AS n, round(sum(value), 6) AS total
FROM events GROUP BY hour, event_type
"""


def q_events_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    return marked.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events")
    )


ORACLE_EVENTS_SESSIONIZE = """
WITH marked AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM marked GROUP BY user_id
"""
# ^ CAST as in ORACLE_UNION: DuckDB sum(INTEGER) → HUGEINT.


def q_events_cube(spark, sf_dir):
    """Cube aggregation (grouping sets): event_type × weekday cells
    plus both margins and the grand total in one shuffle (Spark
    expands the grouping sets map-side)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("weekday", F.date_format("ts", "E"))
        .cube("event_type", "weekday")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
    )


ORACLE_EVENTS_CUBE = """
SELECT event_type, weekday, count(*) AS n, round(sum(value), 6) AS total
FROM (SELECT *, strftime(ts, '%a') AS weekday FROM events)
GROUP BY CUBE (event_type, weekday)
"""


def q_events_json_extract(spark, sf_dir):
    """Semi-structured column handling: parse the events ``props``
    JSON (schema-on-read via from_json) and aggregate an extracted
    field — the lakehouse pattern for ragged event payloads."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), "k INT").alias("p"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("p.k").alias("n_with_k"),
        F.sum("p.k").alias("k_total"),
        F.min("p.k").alias("k_min"),
        F.max("p.k").alias("k_max"),
    )


ORACLE_EVENTS_JSON = """
SELECT event_type,
       count(CAST(json_extract(props, '$.k') AS INTEGER)) AS n_with_k,
       CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS k_total,
       CAST(min(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS k_min,
       CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS k_max
FROM events GROUP BY event_type
"""


def q_events_asof_join(spark, sf_dir):
    """As-of join: each purchase gains the user's latest prior (or
    simultaneous) view value.  Union+window implementation vs DuckDB's
    native ASOF JOIN as the oracle."""
    from .operators.joins import as_of_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = as_of_join(purchases, views, "user_id", "ts", ["value"])
    return out.select(
        "event_id", "user_id", "purchase_value",
        F.col("asof_value").alias("prior_view_value"),
    )


ORACLE_EVENTS_ASOF = """
WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id, p.value AS purchase_value, v.value AS prior_view_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def q_join_broadcast_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("p_brand"))
        .limit(10)
    )


ORACLE_JOIN_REVENUE = """
SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY revenue DESC, p_brand ASC LIMIT 10
"""


def q_anti_join_resume(spark, sf_dir):
    """The icelite resume pattern (B8) as a relational query: work
    units (orders) minus already-committed ones (orders w/ lineitem)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pending = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
    return pending.groupBy("o_orderstatus").agg(F.count("*").alias("n_pending"))


ORACLE_ANTI_JOIN = """
SELECT o_orderstatus, count(*) AS n_pending
FROM orders WHERE NOT EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
) GROUP BY o_orderstatus
"""


def q_remove_boilerplate_lines(spark, sf_dir):
    """CCNet/RefinedWeb-style corpus-level line dedup: lines occurring
    in ≥ 5 distinct documents (the planted cookie banner in every doc;
    the planted footer shared by each doc_id%7 class) are removed from
    every document, order-preserving."""
    docs = _docs(spark, sf_dir)
    corpus = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("COOKIE BANNER ACCEPT"),
            F.col("text"),
            F.concat(F.lit("© footer "), F.pmod("doc_id", F.lit(7)).cast("string")),
        ).alias("text"),
    )
    return text_analysis.remove_boilerplate_lines(corpus, min_docs=5)


ORACLE_BOILERPLATE_LINES = """
WITH corpus AS (
  SELECT doc_id,
         'COOKIE BANNER ACCEPT' || chr(10) || text || chr(10)
           || '© footer ' || CAST(doc_id % 7 AS VARCHAR) AS text
  FROM documents
), lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM corpus
), bp AS (
  SELECT line FROM lines WHERE trim(line) <> ''
  GROUP BY line HAVING count(DISTINCT doc_id) >= 5
), kept AS (
  SELECT l.doc_id, l.line, l.pos FROM lines l
  ANTI JOIN bp b ON l.line = b.line
), agg AS (
  SELECT doc_id,
         array_to_string(list(line ORDER BY pos), chr(10)) AS text_clean,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT c.doc_id,
       coalesce(a.text_clean, '') AS text_clean,
       CAST(len(string_split(c.text, chr(10))) - coalesce(a.n_kept, 0) AS INTEGER)
         AS n_lines_removed
FROM corpus c LEFT JOIN agg a ON c.doc_id = a.doc_id
"""


def q_neardup_survivors(spark, sf_dir):
    """Full near-dup workflow end-to-end: candidate edges → connected
    components → survivor selection (keep each cluster's min id).
    Planted token-disjoint corpus: every doc_id%10==0 doc has one
    +10⁶ copy and distinct docs share no tokens (organic duplicate
    texts exist in the raw corpus at sf0.1), so survivors are exactly
    the original documents table."""
    corpus = _disjoint_dup_corpus(spark, sf_dir)
    edges = dedup.exact_shingle_duplicates(corpus).select("id_a", "id_b")
    return dedup.neardup_survivors(corpus, edges).select("doc_id")


ORACLE_NEARDUP_SURVIVORS = """
SELECT doc_id FROM documents
"""


def q_topk_per_group(spark, sf_dir):
    """Top-3 longest documents per language (B22 per-group form).
    Catalyst plans this as WindowGroupLimit (partial → final): each
    map task prunes to its local top-3 BEFORE the shuffle, so shuffle
    volume is ≤ 3 × groups × tasks at any corpus size."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        docs.withColumn("rank_in_lang", F.row_number().over(w))
        .filter(F.col("rank_in_lang") <= 3)
        .select("lang", "doc_id", "n_chars", "rank_in_lang")
    )


ORACLE_TOPK_PER_GROUP = """
SELECT lang, doc_id, n_chars, CAST(rank_in_lang AS INTEGER) AS rank_in_lang
FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC)
           AS rank_in_lang
  FROM documents
)
WHERE rank_in_lang <= 3
"""


def q_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling: exactly 7 docs per
    doc_id%5 stratum, selected by an engine-portable md5 order key
    (bit-identical in DuckDB)."""
    docs = _docs(spark, sf_dir).withColumn(
        "grp", F.pmod("doc_id", F.lit(5))
    )
    out = sampling.sample_exact_n_per_group(docs, "grp", n=7, seed=42)
    return out.select("doc_id", "grp")


ORACLE_SAMPLE_STRATIFIED = """
WITH g AS (
  SELECT doc_id, doc_id % 5 AS grp,
         md5(CAST(doc_id AS VARCHAR) || '#42') AS k
  FROM documents
), r AS (
  SELECT doc_id, grp,
         row_number() OVER (PARTITION BY grp ORDER BY k, doc_id) AS rn
  FROM g
)
SELECT doc_id, grp FROM r WHERE rn <= 7
"""


def q_extract_density_prune(spark, sf_dir):
    """Text/link-density boilerplate scoring (the north-star heuristic
    beyond the reference's tag rules): a nav link bar (density ≈ 0.9)
    and a short link stub are pruned, the real body text survives.
    The surviving tree is structurally the flagship's (body → h1 →
    div → p), so the span offsets follow the same closed form."""
    docs = _docs(spark, sf_dir)
    html = F.concat(
        F.lit('<html><body><h1>Title '),
        F.col("doc_id").cast("string"),
        F.lit('</h1><div class="nav"><a href="/1">home</a> <a href="/2">about'
              '</a> <a href="/3">contact</a></div><div class="main"><p>'),
        F.col("text"),
        F.lit('</p></div><div class="short"><a href="/x">more</a></div>'
              '</body></html>'),
    )
    wrapped = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                html.alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    ext = extract_documents(wrapped, "density_prune")
    return explode_spans(ext).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("tag"),
        "char_start_idx", "relative_start_pos",
        "char_end_idx", "relative_end_pos", "offset",
    )


# same closed form as ORACLE_FLAGSHIP: after density pruning the
# surviving tree is body[h1, div[p]] with identical texts
ORACLE_DENSITY_PRUNE = """
WITH base AS (
  SELECT doc_id,
         CAST(length('Title ' || CAST(doc_id AS VARCHAR)) AS INTEGER) AS l,
         CAST(length(text) AS INTEGER) AS t
  FROM documents
)
SELECT doc_id, 'body' AS tag,
       CAST(0 AS INTEGER) AS char_start_idx, CAST(0 AS INTEGER) AS relative_start_pos,
       CAST(l + t + 2 AS INTEGER) AS char_end_idx, CAST(1 AS INTEGER) AS relative_end_pos,
       CAST(0 AS INTEGER) AS offset FROM base
UNION ALL
SELECT doc_id, 'h1', 0, 1, l, 0, 1 FROM base
UNION ALL
SELECT doc_id, 'div', l + 1, 0, l + t + 2, 0, 2 FROM base
UNION ALL
SELECT doc_id, 'p', l + 1, 1, l + t + 1, 0, 3 FROM base
"""


def q_extract_pdf(spark, sf_dir):
    """PDF/layout parse (north_rule): deterministic minimal PDFs are
    synthesized from each document's text (one word per line, 5 lines
    per page) and run through the from-scratch PDF text extractor —
    the oracle checks the byte-exact text round-trip and the page
    count in closed form."""
    from .operators import pdf as pdfmod
    from .operators.dedup import _spread

    # CPU-heavy chained Python stages (synthesize + parse) run in the
    # scan's stage: the small sf parquet scans as 1 partition and both
    # stages would serialize on ONE core (measured 5.1 s -> 0.9 s at
    # sf0.1; the CLAUDE.md _spread invariant).  At crawl scale the
    # scan has thousands of splits and this is a no-op.
    docs = _spread(_docs(spark, sf_dir).select("doc_id", "text"))

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"].astype(str),
                    "content": [
                        pdfmod.pdf_bytes_from_text(
                            t.replace(" ", "\n"), lines_per_page=5
                        )
                        for t in b["text"]
                    ],
                }
            )

    blobs = docs.mapInPandas(gen, "doc_id string, content binary")
    out = pdfmod.parse_pdf_documents(blobs)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("text").alias("text_extracted"),
        F.col("n_pages").cast("int").alias("n_pages"),
        "malformed",
    )


ORACLE_EXTRACT_PDF = """
SELECT doc_id,
       replace(text, ' ', chr(10)) AS text_extracted,
       CAST(greatest(ceil(len(string_split(text, ' ')) / 5.0), 1) AS INTEGER)
         AS n_pages,
       FALSE AS malformed
FROM documents
"""


def q_extract_pdf_interleaved(spark, sf_dir):
    """Interleaved PDF parse: text blocks and image paints come back
    as one ordered span sequence in the engine's
    (kind, text, media_ref, offset) contract — the PDF-side analogue
    of extract_interleaved_media."""
    from .operators import pdf as pdfmod
    from .operators.dedup import _spread

    # CPU-heavy chained Python stages (synthesize + parse) run in the
    # scan's stage: the small sf parquet scans as 1 partition and both
    # stages would serialize on ONE core (measured 5.1 s -> 0.9 s at
    # sf0.1; the CLAUDE.md _spread invariant).  At crawl scale the
    # scan has thousands of splits and this is a no-op.
    docs = _spread(_docs(spark, sf_dir).select("doc_id", "text"))

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"].astype(str),
                    "content": [
                        pdfmod.pdf_bytes_from_spans(
                            [
                                ("text", f"Doc {i}"),
                                ("media", f"media://img/{i}"),
                                ("text", t),
                            ]
                        )
                        for i, t in zip(b["doc_id"], b["text"])
                    ],
                }
            )

    blobs = docs.mapInPandas(gen, "doc_id string, content binary")
    out = pdfmod.parse_pdf_interleaved(blobs)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode("spans").alias("s"),
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


ORACLE_EXTRACT_PDF_INTERLEAVED = """
SELECT doc_id, 'text' AS kind, 'Doc ' || CAST(doc_id AS VARCHAR) AS text,
       '' AS media_ref, CAST(0 AS INTEGER) AS offset
FROM documents
UNION ALL
SELECT doc_id, 'media', '', 'media://img/' || CAST(doc_id AS VARCHAR), 1
FROM documents
UNION ALL
SELECT doc_id, 'text', text, '', 2 FROM documents
"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: n-gram overlap of every document
    against a broadcast benchmark set (here: the doc_id%11==0 docs,
    which therefore flag themselves at contamination 1.0).  One corpus
    scan, one broadcast join, one groupBy shuffle."""
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.pmod("doc_id", F.lit(11)) == 0).select("text")
    return decontam.decontaminate(docs, bench, n=3, threshold=0.2)


ORACLE_DECONTAMINATE = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r\f\x0b]+') AS t FROM documents
), bench AS (
  SELECT DISTINCT array_to_string(list_slice(t, i + 1, i + 3), ' ') AS g
  FROM (SELECT t FROM tok WHERE doc_id % 11 = 0) b,
       LATERAL (SELECT unnest(range(0,
         CASE WHEN len(t) >= 3 THEN len(t) - 2 ELSE 0 END)) AS i) s
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(t, i + 1, i + 3), ' ') AS g
  FROM tok,
       LATERAL (SELECT unnest(range(0,
         CASE WHEN len(t) >= 3 THEN len(t) - 2 ELSE 0 END)) AS i) s
), counted AS (
  SELECT g.doc_id, count(*) AS n_ngrams, count(b.g) AS n_shared
  FROM grams g LEFT JOIN bench b ON g.g = b.g
  GROUP BY g.doc_id
), ratio AS (
  SELECT d.doc_id,
         coalesce(c.n_ngrams, 0) AS n_ngrams,
         coalesce(c.n_shared, 0) AS n_shared,
         CASE WHEN coalesce(c.n_ngrams, 0) > 0
              THEN round(c.n_shared / c.n_ngrams, 6) ELSE 0.0 END AS contamination
  FROM documents d LEFT JOIN counted c ON d.doc_id = c.doc_id
)
SELECT doc_id,
       CAST(n_ngrams AS BIGINT) AS n_ngrams,
       CAST(n_shared AS BIGINT) AS n_shared,
       CAST(contamination AS DOUBLE) AS contamination,
       contamination >= 0.2 AS contaminated
FROM ratio
"""


def q_pack_sequences(spark, sf_dir):
    """GPT-style sequence packing: concat-and-chunk each source's docs
    into 256-token training sequences.  One window shuffle on source —
    no global sort at any corpus size."""
    out = packing.pack_sequences(_docs(spark, sf_dir), budget=256)
    return out.select(
        "doc_id", "source", "n_tokens", "seq_id", "offset_in_seq",
        "n_seqs_spanned",
    )


ORACLE_PACK_SEQUENCES = r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(text), '[ \t\n\r\f\x0b]+')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST((cum - n_tokens) // 256 AS BIGINT) AS seq_id,
       CAST((cum - n_tokens) % 256 AS BIGINT) AS offset_in_seq,
       CAST(greatest((cum - 1) // 256, (cum - n_tokens) // 256)
            - (cum - n_tokens) // 256 + 1 AS BIGINT) AS n_seqs_spanned
FROM c
"""


def q_assign_shards(spark, sf_dir):
    """Deterministic training-shard assignment (pseudo-random shard +
    in-shard position) — the scale-correct replacement for a global
    corpus shuffle: ONE window shuffle, never a full sort."""
    out = sampling.assign_shards(_docs(spark, sf_dir), n_shards=8, seed=13)
    return out.select("doc_id", "shard", "pos_in_shard")


ORACLE_ASSIGN_SHARDS = """
WITH s AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '@13'), 1, 8))
              AS BIGINT) % 8 AS shard,
         md5(CAST(doc_id AS VARCHAR) || '!13') AS k
  FROM documents
)
SELECT doc_id, CAST(shard AS INTEGER) AS shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) - 1
            AS BIGINT) AS pos_in_shard
FROM s
"""


def q_normalize_text(spark, sf_dir):
    """C4-style normalization: lowercase, control-char strip,
    whitespace collapse, trim — zero-shuffle codegen projection."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        # plant normalization work: controls, tabs, case, run-on spaces
        F.concat(
            F.lit("  MixedCase\x01\x1f "), F.col("text"), F.lit("\t\ttail  ")
        ).alias("text"),
    )
    return text_analysis.normalize_text(docs).select("doc_id", "text_norm")


ORACLE_NORMALIZE_TEXT = r"""
SELECT doc_id,
       trim(regexp_replace(
         regexp_replace(lower('  MixedCase' || chr(1) || chr(31) || ' '
                              || text || chr(9) || chr(9) || 'tail  '),
                        '[\x00-\x08\x0e-\x1f\x7f-\x9f]', '', 'g'),
         '[ \t\n\r\f\x0b]+', ' ', 'g')) AS text_norm
FROM documents
"""


def q_chunk_documents(spark, sf_dir):
    """Overlapping token-window chunking (RAG/long-context prep):
    32-token windows at stride 16, one output row per chunk, no
    shuffle anywhere in the plan."""
    out = text_analysis.chunk_documents(
        _docs(spark, sf_dir), window=32, stride=16
    )
    return out.select("doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens")


ORACLE_CHUNK_DOCUMENTS = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r\f\x0b]+') AS toks FROM documents
), c AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(
           CAST(ceil((len(toks) - 32) / 16.0) AS INTEGER) + 1, 1)))
           AS chunk_idx
  FROM t
)
SELECT doc_id,
       CAST(chunk_idx AS INTEGER) AS chunk_idx,
       array_to_string(list_slice(toks, chunk_idx * 16 + 1,
                                  chunk_idx * 16 + 32), ' ') AS chunk_text,
       CAST(least(len(toks) - chunk_idx * 16, 32) AS INTEGER)
         AS n_chunk_tokens
FROM c
"""


MIXTURE_RATES = {"en": 0.25, "fr": 0.5, "de": 1.0, "zh": 0.0}


def q_sample_mixture(spark, sf_dir):
    """Data-mixture resampling: deterministic per-language Bernoulli
    keep rates (downsample head languages, drop zh, keep de).  Pure
    codegen filter — zero shuffles, pushed into the scan."""
    out = sampling.sample_mixture(
        _docs(spark, sf_dir), MIXTURE_RATES, default_rate=0.75, seed=7
    )
    return out.select("doc_id", "lang")


ORACLE_SAMPLE_MIXTURE = """
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR) || '%mix7'), 1, 8) <
  CASE lang
    WHEN 'de' THEN 'g'
    WHEN 'en' THEN '40000000'
    WHEN 'fr' THEN '80000000'
    WHEN 'zh' THEN '00000000'
    ELSE 'c0000000'
  END
"""


def q_perplexity_scores(spark, sf_dir):
    """CCNet-style perplexity filtering: Laplace-smoothed bigram LM
    trained on the corpus itself, scored fully relationally (two
    count groupBys + two left joins + one per-doc mean — zero
    Python).  The oracle replicates the whole model build and scoring
    in CTEs."""
    out = text_analysis.perplexity_scores(_docs(spark, sf_dir))
    return out.select("doc_id", "n_bigrams", "avg_logprob", "perplexity")


ORACLE_PERPLEXITY = r"""
WITH base AS (
  SELECT doc_id,
         string_split_regex(trim(text), '[ \t\n\r\f\x0b]+') AS toks
  FROM documents
), uni AS (
  SELECT w1, count(*) AS cu
  FROM (SELECT unnest(toks) AS w1 FROM base) GROUP BY 1
), v AS (SELECT count(*) AS vs FROM uni),
docbi AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM base, LATERAL unnest(range(1, len(toks))) AS t(i)
), bi AS (
  SELECT w1, w2, count(*) AS cb FROM docbi GROUP BY 1, 2
), sc AS (
  SELECT d.doc_id, count(*) AS n_bigrams,
         avg(ln((coalesce(b.cb, 0) + 1.0)
                / (coalesce(u.cu, 0) + (SELECT vs FROM v)))) AS a
  FROM docbi d
  LEFT JOIN bi b ON d.w1 = b.w1 AND d.w2 = b.w2
  LEFT JOIN uni u ON d.w1 = u.w1
  GROUP BY 1
)
SELECT base.doc_id,
       CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(coalesce(sc.a, 0.0), 6) AS avg_logprob,
       round(exp(-coalesce(sc.a, 0.0)), 6) AS perplexity
FROM base LEFT JOIN sc ON base.doc_id = sc.doc_id
"""


def q_dsir_select(spark, sf_dir):
    """DSIR data selection (round 6): hashed-unigram importance
    weights (target = English docs) scored zero-shuffle through a
    literal weight array; top-100 by rounded score.  The oracle
    rebuilds the identical weight table (same md5-bucket hash, same
    Laplace smoothing, same libm ln) and the identical per-doc mean
    in CTEs."""
    out = sampling.dsir_select(
        _docs(spark, sf_dir), F.col("lang") == "en", n=100, n_buckets=4096
    )
    return out.select("doc_id", "n_tokens", "dsir_score")


ORACLE_DSIR = r"""
WITH base AS (
  SELECT doc_id, lang,
         string_split_regex(trim(text), '[ \t\n\r\f\x0b]+') AS toks
  FROM documents
), tok AS (
  SELECT doc_id, (lang = 'en') AS is_t,
         CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 4096 AS b
  FROM (SELECT doc_id, lang, unnest(toks) AS t FROM base)
), counts AS (
  SELECT b, count(*) AS cr, count(*) FILTER (is_t) AS ct
  FROM tok GROUP BY 1
), tots AS (
  SELECT sum(cr) AS n_raw, sum(ct) AS n_t FROM counts
), w AS (
  SELECT b,
         ln((ct + 0.5) / ((SELECT n_t FROM tots) + 0.5 * 4096))
       - ln((cr + 0.5) / ((SELECT n_raw FROM tots) + 0.5 * 4096)) AS w
  FROM counts
), sc AS (
  SELECT tok.doc_id, count(*) AS n_tokens,
         round(sum(w.w) / count(*), 6) AS dsir_score
  FROM tok JOIN w ON tok.b = w.b
  GROUP BY 1
)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, dsir_score
FROM sc ORDER BY dsir_score DESC, doc_id ASC LIMIT 100
"""


def q_temperature_resample(spark, sf_dir):
    """Temperature resampling with CORPUS-DERIVED rates (XLM-R-style
    p^alpha balancing, alpha=0.5): one tiny count collect derives the
    per-language keep rates, then the zero-shuffle md5-threshold
    filter applies them.  The oracle recomputes the same rate
    arithmetic in SQL — identical IEEE doubles via the same libm —
    and the identical threshold-hex construction."""
    out = sampling.temperature_resample(_docs(spark, sf_dir), alpha=0.5)
    return out.select("doc_id", "lang")


# rate_g = (p_g)^(alpha-1) / max_h (p_h)^(alpha-1); the smallest group
# gets exactly 1.0 (x/x) → the 'g' keep-all threshold, matching
# _rate_threshold_hex
ORACLE_TEMPERATURE_RESAMPLE = """
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c),
r AS (SELECT lang, pow(CAST(n AS DOUBLE) / (SELECT total FROM tot), -0.5) AS raw
      FROM c),
rt AS (SELECT lang, raw / (SELECT max(raw) FROM r) AS rate FROM r)
SELECT d.doc_id, d.lang
FROM documents d JOIN rt ON d.lang = rt.lang
WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || '%mix42'), 1, 8) <
  CASE WHEN rate >= 1.0 THEN 'g'
       ELSE lpad(lower(to_hex(CAST(floor(rate * 4294967296.0) AS BIGINT))), 8, '0')
  END
"""


def q_pipeline_pack_corpus(spark, sf_dir):
    """The data-PREP side of a pre-training pipeline as ONE Catalyst
    plan: normalize → exact-dedup survivors (on normalized text) →
    per-language mixture resampling → sequence packing.  Composes only
    oracle-verified pieces; two shuffles total (dedup window + packing
    window — the normalize and mixture stages are codegen-only)."""
    from pyspark.sql import Window

    norm = text_analysis.normalize_text(_docs(spark, sf_dir))
    w = Window.partitionBy(F.md5("text_norm")).orderBy("doc_id")
    survivors = (
        norm.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    mix = sampling.sample_mixture(
        survivors, MIXTURE_RATES, default_rate=0.75, seed=7
    )
    packed = packing.pack_sequences(mix, budget=256, text_col="text_norm")
    return packed.select(
        "doc_id", "lang", "source", "n_tokens", "seq_id", "offset_in_seq"
    )


ORACLE_PIPELINE_PACK = r"""
WITH norm AS (
  SELECT doc_id, lang, source,
         trim(regexp_replace(regexp_replace(lower(text),
              '[\x00-\x08\x0e-\x1f\x7f-\x9f]', '', 'g'),
              '[ \t\n\r\f\x0b]+', ' ', 'g')) AS text_norm
  FROM documents
), surv AS (
  SELECT n.* FROM norm n
  JOIN (SELECT md5(text_norm) AS h, min(doc_id) AS keep
        FROM norm GROUP BY 1) k
    ON md5(n.text_norm) = k.h AND n.doc_id = k.keep
), mix AS (
  SELECT * FROM surv
  WHERE substr(md5(CAST(doc_id AS VARCHAR) || '%mix7'), 1, 8) <
    CASE lang
      WHEN 'de' THEN 'g'
      WHEN 'en' THEN '40000000'
      WHEN 'fr' THEN '80000000'
      WHEN 'zh' THEN '00000000'
      ELSE 'c0000000'
    END
), tok AS (
  SELECT doc_id, lang, source,
         CAST(len(string_split_regex(trim(text_norm), '[ \t\n\r\f\x0b]+'))
              AS BIGINT) AS n_tokens
  FROM mix
), c AS (
  SELECT doc_id, lang, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM tok
)
SELECT doc_id, lang, source, n_tokens,
       CAST((cum - n_tokens) // 256 AS BIGINT) AS seq_id,
       CAST((cum - n_tokens) % 256 AS BIGINT) AS offset_in_seq
FROM c
"""


# =========================================================================
# icelite table layer: row-level deletes / MERGE + stats pruning (round 6)
# =========================================================================


def q_icelite_delete_read(spark, sf_dir):
    """Row-level deletes + MERGE through the icelite table layer
    (round 6, VERDICT r5 #1): the documents table is committed to a
    throwaway icelite table, ``doc_id % 10 == 3`` is retracted by an
    equality-delete commit (the PII-takedown shape — no data
    rewrite), and ``doc_id % 10 == 4`` is atomically UPSERTED via
    ``merge()`` with a recrawled text.  The read path anti-joins the
    delete files (broadcast) and the merge's own rows survive its
    delete (Iceberg's strictly-lower-sequence rule); the oracle
    states the resulting end state relationally."""
    import shutil
    import tempfile

    from .plans.icelite import IceliteTable

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    tmp = tempfile.mkdtemp(prefix="icelite_delete_q_")
    try:
        t = IceliteTable(os.path.join(tmp, "tbl"))
        bucket = F.pmod(F.col("doc_id"), F.lit(8)).cast("int")
        t.commit_append(docs.withColumn("bucket", bucket))
        t.commit_delete(
            docs.filter(F.col("doc_id") % 10 == 3).select("doc_id")
        )
        recrawl = (
            docs.filter(F.col("doc_id") % 10 == 4)
            .select(
                "doc_id",
                F.concat(F.lit("recrawl: "), F.col("text")).alias("text"),
                "lang",
            )
            .withColumn("bucket", bucket)
        )
        t.merge(recrawl, key_col="doc_id")
        out = t.read(spark).select("doc_id", "text", "lang")
        # the table dir is removed on return: pin the result rows in
        # block storage first (the driver collects later)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_ICELITE_DELETE = """
SELECT doc_id,
       CASE WHEN doc_id % 10 = 4 THEN 'recrawl: ' || text ELSE text END
         AS text,
       lang
FROM documents
WHERE doc_id % 10 <> 3
"""


def q_icelite_stats_prune(spark, sf_dir):
    """File-level column-stats pruning (round 6, VERDICT r5 #2): the
    corpus is committed with lang-correlated buckets so each data
    file covers one language; ``read(prune=[("lang","=","en")])``
    drops every other file at the MANIFEST level (the shrunken
    inputFiles list is pinned in pytest), and the residual row filter
    makes the result exact — identical to the plain relational filter
    the oracle states."""
    import shutil
    import tempfile

    from .plans.icelite import IceliteTable

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang", "n_chars")
    tmp = tempfile.mkdtemp(prefix="icelite_prune_q_")
    try:
        t = IceliteTable(os.path.join(tmp, "tbl"))
        salted = docs.withColumn(
            "bucket", F.pmod(F.xxhash64("lang"), F.lit(8)).cast("int")
        )
        t.commit_append(salted)
        pruned = t.read(spark, prune=[("lang", "=", "en")])
        out = pruned.filter(F.col("lang") == "en").select(
            "doc_id", "lang", "n_chars"
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_ICELITE_PRUNE = """
SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'
"""


def q_icelite_rebucket_resume(spark, sf_dir):
    """Partition-spec evolution + exact resume (round 6): a PARTIAL
    corpus (doc_id % 3 != 0) is committed under an 8-bucket layout,
    the table is re-laid-out via ``compact(rebucket_to=32)`` (the
    cluster-grew case), and the interrupted ingest then resumes over
    the FULL corpus.  Post-rebucket, bucket-level skip-if-done is
    unsound (a committed new-bucket id can cover never-ingested docs),
    so ``filter_pending`` auto-switches to the doc-exact anti-join —
    the missing third arrives exactly once and the result is the
    whole corpus, which is precisely what the oracle states."""
    import shutil
    import tempfile

    from .plans.icelite import IceliteTable

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    tmp = tempfile.mkdtemp(prefix="icelite_rebucket_q_")
    try:
        t = IceliteTable(os.path.join(tmp, "tbl"))
        bucket8 = F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int")
        t.commit_append(
            docs.filter(F.col("doc_id") % 3 != 0).withColumn("bucket", bucket8)
        )
        t.compact(spark, rebucket_to=32)
        assert t.requires_exact_resume()
        bucket32 = F.pmod(F.xxhash64("doc_id"), F.lit(32)).cast("int")
        pending = t.filter_pending(docs.withColumn("bucket", bucket32))
        t.commit_append(pending)
        out = t.read(spark).select("doc_id", "text", "lang")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_ICELITE_REBUCKET = """
SELECT doc_id, text, lang FROM documents
"""


def q_icelite_wap(spark, sf_dir):
    """Write-audit-publish through a branch (round 6): two thirds of
    the corpus is live on main; the remaining third PLUS a takedown of
    ``doc_id % 10 == 6`` is staged on a branch (invisible to main's
    readers — asserted mid-flight), audited via the branch's own read
    view, then published as a fast-forward.  The final main state is
    exactly the relational statement the oracle makes; a failed audit
    would have discarded the branch with main untouched."""
    import shutil
    import tempfile

    from .plans.icelite import IceliteTable

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    tmp = tempfile.mkdtemp(prefix="icelite_wap_q_")
    try:
        t = IceliteTable(os.path.join(tmp, "tbl"))
        bucket = F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int")
        t.commit_append(
            docs.filter(F.col("doc_id") % 3 != 0).withColumn("bucket", bucket)
        )
        t.create_branch("wap")
        b = t.branch("wap")
        b.commit_append(
            docs.filter(F.col("doc_id") % 3 == 0).withColumn("bucket", bucket)
        )
        b.commit_delete(
            docs.filter(F.col("doc_id") % 10 == 6).select("doc_id")
        )
        # staging is invisible to main until the audit passes
        assert t.read(spark).count() < b.read(spark).count() + 1
        t.publish_branch("wap")
        out = t.read(spark).select("doc_id", "text", "lang")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_ICELITE_WAP = """
SELECT doc_id, text, lang FROM documents WHERE doc_id % 10 <> 6
"""


def q_icelite_tag_release(spark, sf_dir):
    """Tagged dataset releases (round 6): two thirds of the corpus is
    ingested, takedowns are applied, and the state is tagged ``v1``
    (the exact corpus a model trains on); ingest then continues and a
    ``compact()`` expires the untagged history.  ``read(tag="v1")``
    must still reproduce the release byte-for-byte — tag-pinned
    manifests survive compaction/cleanup and vacuum treats their data
    dirs as live.  The oracle states the release's membership
    relationally."""
    import shutil
    import tempfile

    from .plans.icelite import IceliteTable

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    tmp = tempfile.mkdtemp(prefix="icelite_tag_q_")
    try:
        t = IceliteTable(os.path.join(tmp, "tbl"))
        bucket = F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int")
        t.commit_append(
            docs.filter(F.col("doc_id") % 3 != 0).withColumn("bucket", bucket)
        )
        t.commit_delete(
            docs.filter(
                (F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 10 == 3)
            ).select("doc_id")
        )
        t.tag("v1")
        t.commit_append(
            docs.filter(F.col("doc_id") % 3 == 0).withColumn("bucket", bucket)
        )
        t.compact(spark)
        t.vacuum(grace_sec=0)
        out = t.read(spark, tag="v1").select("doc_id", "text", "lang")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_ICELITE_TAG = """
SELECT doc_id, text, lang FROM documents
WHERE doc_id % 3 <> 0 AND doc_id % 10 <> 3
"""


def q_pack_interleaved(spark, sf_dir):
    """Interleaved multimodal sequence packing (round 6): documents
    are rebuilt as the BASELINE input_hint row shape — an ordered
    span array [text-half₁, image, text-half₂] — and packed into
    256-token training sequences where an image costs a fixed 32
    vision-adapter tokens and spans are ATOMIC (an image token block
    never splits across sequences).  One posexplode + ONE
    per-language window shuffle (the pack_sequences scale shape); the
    oracle restates the construction and the running-sum layout
    relationally."""
    from .operators.packing import pack_interleaved

    docs = _docs(spark, sf_dir)
    h = F.floor(F.length("text") / 2).cast("int")
    inter = docs.select(
        "doc_id",
        "lang",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").substr(F.lit(1), h).alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            ),
            F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                F.concat(
                    F.lit("media://img/"), F.col("doc_id").cast("string")
                ).alias("media_ref"),
                F.lit(1).cast("int").alias("offset"),
            ),
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").substr(h + 1, F.length("text")).alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(2).cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )
    out = pack_interleaved(
        inter, budget=256, media_cost=32, part_col="lang"
    ).select(
        "lang", "doc_id", "span_pos", "kind", "media_ref",
        "n_tokens", "seq_id", "offset_in_seq",
    )
    return out


ORACLE_PACK_INTERLEAVED = r"""
WITH halves AS (
  SELECT doc_id, lang,
         substr(text, 1, CAST(floor(length(text) / 2) AS INTEGER)) AS t1,
         substr(text, CAST(floor(length(text) / 2) AS INTEGER) + 1) AS t2
  FROM documents
), spans AS (
  SELECT doc_id, lang, 0 AS span_pos, 'text' AS kind, '' AS media_ref,
         CAST(len(string_split_regex(trim(t1), '[ \t\n\r\f\x0b]+'))
              AS BIGINT) AS n_tokens
  FROM halves
  UNION ALL
  SELECT doc_id, lang, 1, 'media',
         'media://img/' || CAST(doc_id AS VARCHAR), CAST(32 AS BIGINT)
  FROM halves
  UNION ALL
  SELECT doc_id, lang, 2, 'text', '',
         CAST(len(string_split_regex(trim(t2), '[ \t\n\r\f\x0b]+'))
              AS BIGINT)
  FROM halves
), cum AS (
  SELECT *,
         SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id, span_pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS start
  FROM spans
)
SELECT lang, doc_id, span_pos, kind, media_ref, n_tokens,
       CAST(floor(start / 256) AS BIGINT) AS seq_id,
       CAST(start % 256 AS BIGINT) AS offset_in_seq
FROM cum
"""


def q_icelite_point_lookup(spark, sf_dir):
    """Per-file key Bloom index (round 6): the corpus is committed
    across 16 hash buckets (high-cardinality ids interleave into
    every file, so min/max file stats can never skip anything),
    ``index_keys`` builds one small bitmap per data file in a single
    distributed pass, and ``read(prune=[("doc_id","in",...)])`` drops
    every file whose bitmap provably lacks ALL probed keys at the
    MANIFEST level.  Pruning is a superset guarantee (unindexed and
    false-positive files survive) and the residual IN filter makes
    the result exact — identical to the relational lookup the oracle
    states.  The file-list shrink itself is pinned in pytest."""
    import shutil
    import tempfile

    from .plans.icelite import IceliteTable

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    tmp = tempfile.mkdtemp(prefix="icelite_ptlookup_q_")
    try:
        t = IceliteTable(os.path.join(tmp, "tbl"))
        bucket = F.pmod(F.xxhash64("doc_id"), F.lit(16)).cast("int")
        t.commit_append(docs.withColumn("bucket", bucket))
        t.index_keys(spark, col="doc_id")
        out = (
            t.read(spark, prune=[("doc_id", "in", 7, 123, 401)])
            .filter(F.col("doc_id").isin(7, 123, 401))
            .select("doc_id", "text", "lang")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_ICELITE_POINT_LOOKUP = """
SELECT doc_id, text, lang FROM documents WHERE doc_id IN (7, 123, 401)
"""


def q_icelite_changelog(spark, sf_dir):
    """CDC changelog scan (round 6): the corpus is committed in two
    halves (evens at sequence 0, odds at sequence 1), ``doc_id % 10
    == 3`` is retracted, and ``doc_id % 10 == 4`` is atomically
    upserted via ``merge()``; ``read_changes`` then reports the full
    history — raw inserts attributed to their committing sequence by
    the broadcast file→snapshot map, delete events carrying the full
    OLD row image of exactly the rows live when the delete committed,
    and the merge emitting both events at its own sequence.  The
    oracle reconstructs the same event log relationally (snapshot ids
    are uuids, so only the deterministic columns are compared)."""
    import shutil
    import tempfile

    from .plans.icelite import IceliteTable

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    tmp = tempfile.mkdtemp(prefix="icelite_changelog_q_")
    try:
        t = IceliteTable(os.path.join(tmp, "tbl"))
        bucket = F.pmod(F.col("doc_id"), F.lit(8)).cast("int")
        t.commit_append(
            docs.filter(F.col("doc_id") % 2 == 0).withColumn("bucket", bucket)
        )                                                   # seq 0
        t.commit_append(
            docs.filter(F.col("doc_id") % 2 == 1).withColumn("bucket", bucket)
        )                                                   # seq 1
        t.commit_delete(
            docs.filter(F.col("doc_id") % 10 == 3).select("doc_id")
        )                                                   # seq 2
        recrawl = (
            docs.filter(F.col("doc_id") % 10 == 4)
            .select(
                "doc_id",
                F.concat(F.lit("recrawl: "), F.col("text")).alias("text"),
                "lang",
            )
            .withColumn("bucket", bucket)
        )
        t.merge(recrawl, key_col="doc_id")                  # seq 3
        out = t.read_changes(spark).select(
            "doc_id",
            "text",
            "lang",
            F.col("_change_type").alias("change_type"),
            F.col("_commit_sequence").alias("commit_seq"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_ICELITE_CHANGELOG = """
SELECT doc_id, text, lang, 'insert' AS change_type,
       CAST(doc_id % 2 AS BIGINT) AS commit_seq
FROM documents
UNION ALL
SELECT doc_id, text, lang, 'delete', 2 FROM documents WHERE doc_id % 10 = 3
UNION ALL
SELECT doc_id, text, lang, 'delete', 3 FROM documents WHERE doc_id % 10 = 4
UNION ALL
SELECT doc_id, 'recrawl: ' || text, lang, 'insert', 3
FROM documents WHERE doc_id % 10 = 4
"""


def q_icelite_rollback(spark, sf_dir):
    """Snapshot rollback (round 6, Iceberg ``rollback_to_snapshot``):
    two thirds of the corpus is committed, then a POISONED batch of
    the remaining third (corrupted text); ``rollback()`` truncates the
    bad commit as pure metadata — no rewrite — and the corrected third
    is re-ingested on top of the restored state.  If the rollback
    failed to truncate, the poisoned rows would survive and the row
    count would double on the final third; the oracle states the
    corrected end state relationally."""
    import shutil
    import tempfile

    from .plans.icelite import IceliteTable

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    tmp = tempfile.mkdtemp(prefix="icelite_rollback_q_")
    try:
        t = IceliteTable(os.path.join(tmp, "tbl"))
        bucket = F.pmod(F.col("doc_id"), F.lit(8)).cast("int")
        good = t.commit_append(
            docs.filter(F.col("doc_id") % 3 != 0).withColumn("bucket", bucket)
        )
        t.commit_append(  # the poisoned crawl batch
            docs.filter(F.col("doc_id") % 3 == 0)
            .select(
                "doc_id",
                F.concat(F.lit("POISON "), F.col("text")).alias("text"),
                "lang",
            )
            .withColumn("bucket", bucket)
        )
        t.rollback(good["snapshot_id"])
        t.commit_append(  # corrected re-ingest on the restored state
            docs.filter(F.col("doc_id") % 3 == 0)
            .select(
                "doc_id",
                F.concat(F.lit("v2: "), F.col("text")).alias("text"),
                "lang",
            )
            .withColumn("bucket", bucket)
        )
        out = t.read(spark).select("doc_id", "text", "lang")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_ICELITE_ROLLBACK = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'v2: ' || text ELSE text END AS text,
       lang
FROM documents
"""


def q_icelite_partitions_meta(spark, sf_dir):
    """Metadata tables (round 6, Iceberg's ``partitions``): the corpus
    is committed under a ``doc_id % 8`` bucket layout and the
    per-bucket lineage summary is read back from the MANIFESTS alone —
    no data file is opened (the skew report a 100-TB maintenance job
    runs).  ``compact=True`` commits exactly one file per non-empty
    bucket, so ``n_files``/``n_snapshots`` are deterministic; the
    oracle restates the per-bucket row counts relationally."""
    import shutil
    import tempfile

    from .plans.icelite import IceliteTable

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    tmp = tempfile.mkdtemp(prefix="icelite_parts_q_")
    try:
        t = IceliteTable(os.path.join(tmp, "tbl"))
        bucket = F.pmod(F.col("doc_id"), F.lit(8)).cast("int")
        t.commit_append(docs.withColumn("bucket", bucket))
        out = t.partitions_df(spark).select(
            "bucket", "rows", "n_files", "n_snapshots"
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_ICELITE_PARTITIONS = """
SELECT CAST(doc_id % 8 AS INTEGER) AS bucket,
       COUNT(*) AS rows,
       1 AS n_files,
       1 AS n_snapshots
FROM documents
GROUP BY 1
"""


def q_icelite_sql_view(spark, sf_dir):
    """SQL surface (round 6): the icelite table registered as temp
    views (``register_views`` — the catalog seam) and consumed with
    plain ``spark.sql`` — a per-language aggregate over the CURRENT
    read (a takedown of ``doc_id % 10 == 2`` already resolved by the
    view) joined against the ``_partitions`` metadata view's file
    census.  The oracle restates both relationally."""
    import shutil
    import tempfile

    from .plans.icelite import IceliteTable

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang", "n_chars")
    tmp = tempfile.mkdtemp(prefix="icelite_sqlv_q_")
    try:
        t = IceliteTable(os.path.join(tmp, "tbl"))
        bucket = F.pmod(F.col("doc_id"), F.lit(8)).cast("int")
        t.commit_append(docs.withColumn("bucket", bucket))
        t.commit_delete(
            docs.filter(F.col("doc_id") % 10 == 2).select("doc_id")
        )
        t.register_views(spark, "icelite_sqlv_corpus")
        out = spark.sql("""
            SELECT d.lang,
                   COUNT(*) AS n_docs,
                   CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
                   (SELECT CAST(SUM(n_files) AS BIGINT)
                    FROM icelite_sqlv_corpus_partitions) AS table_files
            FROM icelite_sqlv_corpus d
            GROUP BY d.lang
        """)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_ICELITE_SQL_VIEW = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(8 AS BIGINT) AS table_files
FROM documents
WHERE doc_id % 10 <> 2
GROUP BY lang
"""


def q_icelite_zorder_prune(spark, sf_dir):
    """Z-order rewrite + multi-dimension file skipping (round 6,
    Iceberg rewrite_data_files z-order): the corpus is committed
    unsorted, re-clustered by the interleaved-bit z-value over
    ``(doc_id, n_chars)``, and then read under BOTH predicates with
    manifest-level stats pruning — each dimension's window drops
    files on its own (pinned in pytest); the residual row filter
    makes the result exact, identical to the plain relational filter
    the oracle states."""
    import shutil
    import tempfile

    from .plans.icelite import IceliteTable

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang", "n_chars")
    tmp = tempfile.mkdtemp(prefix="icelite_zorder_q_")
    try:
        t = IceliteTable(os.path.join(tmp, "tbl"))
        bucket = F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int")
        t.commit_append(docs.withColumn("bucket", bucket))
        t.compact(spark, zorder=["doc_id", "n_chars"])
        pruned = t.read(
            spark,
            prune=[("doc_id", "<=", 200), ("n_chars", ">=", 500)],
        )
        out = pruned.filter(
            (F.col("doc_id") <= 200) & (F.col("n_chars") >= 500)
        ).select("doc_id", "lang", "n_chars")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_ICELITE_ZORDER = """
SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id <= 200 AND n_chars >= 500
"""


def q_icelite_rewrite(spark, sf_dir):
    """Partial compaction (round 6, Iceberg ``rewrite_data_files``
    with a filter): the corpus is committed in two fragmenting halves,
    ``doc_id % 10 == 7`` is retracted, and only buckets {0, 1} are
    rewritten — folding their small files and THEIR share of the
    equality delete, while the other six buckets keep their original
    files and resolve the delete through the read-path anti-join.  At
    100 TB this is the only maintenance shape that works (a full
    compact rewrites the corpus to fold one hot bucket).  Either
    physical path must produce the same logical table, which the
    oracle states relationally."""
    import shutil
    import tempfile

    from .plans.icelite import IceliteTable

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    tmp = tempfile.mkdtemp(prefix="icelite_rewrite_q_")
    try:
        t = IceliteTable(os.path.join(tmp, "tbl"))
        bucket = F.pmod(F.col("doc_id"), F.lit(8)).cast("int")
        t.commit_append(
            docs.filter(F.col("doc_id") % 2 == 0).withColumn("bucket", bucket)
        )
        t.commit_append(
            docs.filter(F.col("doc_id") % 2 == 1).withColumn("bucket", bucket)
        )
        t.commit_delete(
            docs.filter(F.col("doc_id") % 10 == 7).select("doc_id")
        )
        assert t.rewrite(spark, buckets={0, 1}) is not None
        out = t.read(spark).select("doc_id", "text", "lang")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_ICELITE_REWRITE = """
SELECT doc_id, text, lang FROM documents WHERE doc_id % 10 <> 7
"""

def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 sparse lexical retrieval (retrieval.bm25_topk):
    benchmark-leak triage / corpus search.  Postings rows are pruned
    to the query's terms at the scan, per-term document frequencies
    and the 1-row (N, avgdl) corpus stats join by broadcast, ranking
    is a TakeOrderedAndProject — no corpus shuffle on the query path.
    Scores rounded to 6 decimals BEFORE ranking in both engines so
    summation-order ULP noise can't flip the top-k boundary."""
    out = retrieval.bm25_topk(
        _docs(spark, sf_dir), "hash join window stream", k=15
    )
    return out.select("doc_id", "bm25")


# Constants mirror retrieval.bm25_topk defaults: k1=1.5, b=0.75,
# (k1+1)=2.5, (1-b)=0.25; idf is Lucene's ln(1 + (N-df+.5)/(df+.5)).
# Expression association order matches the Spark build exactly (libm
# ln is bit-identical across engines on this box; round(6) kills the
# remaining sum-order ULPs).
ORACLE_BM25_TOPK = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r\f\x0b]+') AS arr
  FROM documents
),
dl AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS dl FROM toks),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         AVG(CAST(dl AS DOUBLE)) AS avgdl
  FROM dl
),
terms AS (SELECT doc_id, unnest(arr) AS term FROM toks),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM terms
  WHERE term IN ('hash', 'join', 'stream', 'window')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id,
       CAST(round(SUM(
         ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
         * tf.tf * 2.5
         / (tf.tf + 1.5 * (0.25 + 0.75 * dl.dl / stats.avgdl))
       ), 6) AS DOUBLE) AS bm25
FROM tf
JOIN dfreq USING (term)
JOIN dl USING (doc_id)
CROSS JOIN stats
GROUP BY 1
ORDER BY bm25 DESC, doc_id ASC
LIMIT 15
"""


def q_icelite_matview_postings(spark, sf_dir):
    """CDC-maintained materialized view (plans/matview.py): a BM25
    postings table tracks the corpus through an initial load, a
    re-crawl upsert (doc_id%10==4, merge) and a takedown delete
    (doc_id%10==3) — three maintenance cycles driven by
    consume_changes, each source snapshot applied as replay-skippable
    del/ins commits.  Returns the final postings rows; the oracle
    states doc_terms over the NET corpus relationally, so any missed
    retraction, double-applied insert, or stale upsert row breaks the
    hash."""
    import shutil
    import tempfile

    from .plans.icelite import IceliteTable
    from .plans.matview import maintain_derived, postings_transform

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="icelite_matview_q_")
    try:
        src = IceliteTable(os.path.join(tmp, "src"))
        pv = IceliteTable(os.path.join(tmp, "postings"))
        tr = postings_transform(n_buckets=8)
        bucket = F.pmod(F.col("doc_id"), F.lit(8)).cast("int")
        src.commit_append(docs.withColumn("bucket", bucket))
        maintain_derived(spark, src, pv, tr)
        recrawl = docs.filter(F.col("doc_id") % 10 == 4).select(
            "doc_id",
            F.concat(F.lit("recrawl: "), F.col("text")).alias("text"),
        )
        src.merge(recrawl.withColumn("bucket", bucket), key_col="doc_id")
        src.commit_delete(
            docs.filter(F.col("doc_id") % 10 == 3).select("doc_id")
        )
        maintain_derived(spark, src, pv, tr)
        out = pv.read(spark).select("doc_id", "term", "tf", "dl")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_ICELITE_MATVIEW = r"""
WITH net AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % 10 NOT IN (3, 4)
  UNION ALL
  SELECT doc_id, 'recrawl: ' || text FROM documents WHERE doc_id % 10 = 4
),
toks AS (
  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r\f\x0b]+') AS arr
  FROM net
)
SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf,
       CAST(any_value(dl) AS BIGINT) AS dl
FROM (
  SELECT doc_id, unnest(arr) AS term, len(arr) AS dl FROM toks
)
GROUP BY doc_id, term
"""


def q_tfidf_top_terms(spark, sf_dir):
    """Per-document keyword extraction: top-3 smoothed-TF-IDF terms
    (retrieval.top_terms_per_doc).  The vocabulary df aggregate is the
    one non-broadcast shuffle; the per-doc cut is WindowGroupLimit."""
    out = retrieval.top_terms_per_doc(_docs(spark, sf_dir), n=3)
    return out.select("doc_id", "term", "tfidf", "rank")


ORACLE_TFIDF_TOP_TERMS = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r\f\x0b]+') AS arr
  FROM documents
),
dl AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS dl FROM toks),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM dl),
terms AS (SELECT doc_id, unnest(arr) AS term FROM toks),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM terms GROUP BY 1, 2
),
dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id, tf.term,
         CAST(round(
           tf.tf / dl.dl * (ln((1.0 + stats.n) / (1.0 + dfreq.df)) + 1.0),
         6) AS DOUBLE) AS tfidf
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
)
SELECT doc_id, term, tfidf,
       CAST(row_number() OVER (
         PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
       ) AS INTEGER) AS rank
FROM sc
QUALIFY rank <= 3
"""


def q_events_range_join(spark, sf_dir):
    """Interval containment via joins.range_join (bin bucketing): each
    event joined to the 1-hour per-user windows opened by every 97th
    event.  The naive theta-join is a BroadcastNestedLoopJoin; the
    binned shape is a plain shuffled equi-join on (user, 10-min bin)
    + residual filter — each pair meets in exactly one bin, no dedup.
    Epoch micros on both engines (unix_micros / epoch_us)."""
    from .operators import joins

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        # ts is TIMESTAMP_NTZ; the cast adopts the session tz (UTC on
        # this rig) so unix_micros == DuckDB epoch_us exactly
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    win = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 97 == 0)
        .select(
            F.col("event_id").alias("window_id"),
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ws"),
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                + F.lit(3_600_000_000)
            ).alias("we"),
        )
    )
    out = joins.range_join(
        ev, win, "t", "ws", "we", bin_width=600_000_000, key_cols=["user_id"]
    )
    return out.select("event_id", "user_id", "window_id")


ORACLE_EVENTS_RANGE_JOIN = """
WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events),
win AS (
  SELECT event_id AS window_id, user_id, epoch_us(ts) AS ws,
         epoch_us(ts) + 3600000000 AS we
  FROM events WHERE event_id % 97 = 0
)
SELECT e.event_id, e.user_id, w.window_id
FROM ev e
JOIN win w
  ON e.user_id = w.user_id AND w.ws <= e.t AND e.t < w.we
"""


def q_bm25_batch_topk(spark, sf_dir):
    """Batched BM25: a whole query TABLE against the corpus in one
    postings pass (retrieval.bm25_batch_topk) — the eval-set leak
    triage shape.  Query terms and per-term df broadcast; scoring
    shuffles slim (qid, doc, score) rows; the per-query cut executes
    as WindowGroupLimit (map-side top-k before the shuffle)."""
    queries_df = spark.createDataFrame(
        [
            (1, "hash join"),
            (2, "window stream scan"),
            (3, "parquet column  group"),
        ],
        "query_id long, query string",
    )
    out = retrieval.bm25_batch_topk(_docs(spark, sf_dir), queries_df, k=5)
    return out.select("query_id", "doc_id", "bm25", "rank")


ORACLE_BM25_BATCH = r"""
WITH queries(query_id, query) AS (
  VALUES (1, 'hash join'), (2, 'window stream scan'),
         (3, 'parquet column  group')
),
toks AS (
  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r\f\x0b]+') AS arr
  FROM documents
),
dl AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS dl FROM toks),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         AVG(CAST(dl AS DOUBLE)) AS avgdl
  FROM dl
),
qt AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id,
           unnest(string_split_regex(trim(query), '[ \t\n\r\f\x0b]+')) AS term
    FROM queries
  ) WHERE length(term) > 0
),
terms AS (SELECT doc_id, unnest(arr) AS term FROM toks),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM terms
  WHERE term IN (SELECT term FROM qt)
  GROUP BY 1, 2
),
dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(round(SUM(
           ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * tf.tf * 2.5
           / (tf.tf + 1.5 * (0.25 + 0.75 * dl.dl / stats.avgdl))
         ), 6) AS DOUBLE) AS bm25
  FROM tf
  JOIN dfreq USING (term)
  JOIN qt USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY 1, 2
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, bm25,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY bm25 DESC, doc_id ASC
       ) AS INTEGER) AS rank
FROM scores
QUALIFY rank <= 5
"""


def q_dedup_keep_best(spark, sf_dir):
    """Keep-BEST retention over normalized-exact duplicate clusters
    (dedup.keep_longest_normalized): plants two whitespace/case
    variants per doc_id%5==0 document (ids +100000/+200000, both 4
    raw chars longer than the base), so the survivor must be the
    longest variant with the min-id tie-break (+100000 beats the
    equal-length +200000).  One partial-agg shuffle; no window."""
    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang", "source")
    base = docs.filter(F.col("doc_id") % 5 == 0)
    va = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("  "), F.upper(F.col("text")), F.lit("\t\n")).alias("text"),
        "lang",
        "source",
    )
    vb = base.select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.lit("\t\n"), F.upper(F.col("text")), F.lit("  ")).alias("text"),
        "lang",
        "source",
    )
    out = dedup.keep_longest_normalized(docs.unionByName(va).unionByName(vb))
    return out.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("long").alias("n_raw_chars"),
    )


# Cluster key spelled as normalize_text's exact oracle expression
# (ORACLE_NORMALIZE_TEXT); retention = longest raw text, ties min id.
ORACLE_DEDUP_KEEP_BEST = r"""
WITH corpus AS (
  SELECT doc_id, text, lang, source FROM documents
  UNION ALL
  SELECT doc_id + 100000, '  ' || upper(text) || chr(9) || chr(10), lang, source
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 200000, chr(9) || chr(10) || upper(text) || '  ', lang, source
  FROM documents WHERE doc_id % 5 = 0
),
n AS (
  SELECT doc_id, lang, source,
         CAST(length(text) AS BIGINT) AS n_raw_chars,
         trim(regexp_replace(regexp_replace(lower(text),
              '[\x00-\x08\x0e-\x1f\x7f-\x9f]', '', 'g'),
              '[ \t\n\r\f\x0b]+', ' ', 'g')) AS ck
  FROM corpus
)
SELECT doc_id, lang, source, n_raw_chars
FROM n
QUALIFY row_number() OVER (
  PARTITION BY ck ORDER BY n_raw_chars DESC, doc_id ASC
) = 1
"""


# =========================================================================
# Registry
# =========================================================================

# Ordering contract (VERDICT r3 #2): the driver's per-round
# correctness sweep covers roughly the FIRST 50 entries, so the dict
# is ordered least-recently-driver-recorded first.  Rotation rule
# (queries.py registry contract, VERDICT r4 #3): any entry that
# changes, or whose oracle changes, moves to the TOP; entries past
# the ~50-entry window rotate back into it the following round.
#
# Round-6 rotation (VERDICT r5 #5): the 22-entry r5 tail
# (events/multimodal/dedup_substring/quality families — last
# driver-recorded r04, judge-green via check_oracles.py in r5)
# rotates back into the window, led by the twenty-four NEW round-6 entries
# (bm25_topk, bm25_batch_topk, tfidf_top_terms, icelite_matview_postings,
# dedup_keep_best, events_range_join,
# icelite_rollback, icelite_partitions_meta, icelite_zorder_prune,
# icelite_rewrite, similarity_sq8_topk, icelite_sql_view,
# icelite_wap,
# icelite_tag_release, pack_interleaved,
# icelite_point_lookup, icelite_changelog, icelite_delete_read,
# icelite_stats_prune, semantic_dedup, dsir_select,
# icelite_rebucket_resume,
# dedup_paragraphs, dedup_neardup_incremental).  The entries the r05 driver sweep just
# recorded green move toward the tail; every tail entry additionally
# has an independent pytest and a full check_oracles.py re-run each
# round.
# Authoritative count this round: 99 queries, 99 oracles (no
# rows-only entries) — COVERAGE.md carries the same number.
QUERIES = {
    # NEW this round (insert-at-top rule)
    "bm25_topk": q_bm25_topk,
    "bm25_batch_topk": q_bm25_batch_topk,
    "tfidf_top_terms": q_tfidf_top_terms,
    "icelite_matview_postings": q_icelite_matview_postings,
    "events_range_join": q_events_range_join,
    "dedup_keep_best": q_dedup_keep_best,
    "icelite_rollback": q_icelite_rollback,
    "icelite_partitions_meta": q_icelite_partitions_meta,
    "icelite_zorder_prune": q_icelite_zorder_prune,
    "icelite_rewrite": q_icelite_rewrite,
    "similarity_sq8_topk": q_similarity_sq8_topk,
    "icelite_sql_view": q_icelite_sql_view,
    "icelite_wap": q_icelite_wap,
    "icelite_tag_release": q_icelite_tag_release,
    "pack_interleaved": q_pack_interleaved,
    "icelite_point_lookup": q_icelite_point_lookup,
    "icelite_changelog": q_icelite_changelog,
    "icelite_delete_read": q_icelite_delete_read,
    "icelite_stats_prune": q_icelite_stats_prune,
    "semantic_dedup": q_semantic_dedup,
    "dsir_select": q_dsir_select,
    "icelite_rebucket_resume": q_icelite_rebucket_resume,
    "dedup_paragraphs": q_dedup_paragraphs,
    "dedup_neardup_incremental": q_dedup_neardup_incremental,
    # ---- rotated back into the sweep window (last driver record r04;
    # judge-green in r5 via check_oracles.py) ----
    "events_window_agg": q_events_window_agg,
    "events_sessionize": q_events_sessionize,
    "events_asof_join": q_events_asof_join,
    "events_json_extract": q_events_json_extract,
    "events_cube": q_events_cube,
    "join_broadcast_revenue": q_join_broadcast_revenue,
    "anti_join_resume": q_anti_join_resume,
    "multimodal_features": q_multimodal_features,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frames": q_multimodal_frames,
    "dedup_substring": q_dedup_substring,
    "dedup_substring_removal": q_dedup_substring_removal,
    "dedup_incremental": q_dedup_incremental,
    "similarity_ivfpq_topk": q_similarity_ivfpq,
    "quality_classifier": q_quality_classifier,
    "gopher_rules": q_gopher_rules,
    "temperature_resample": q_temperature_resample,
    "perplexity_scores": q_perplexity_scores,
    "media_text_pairs": q_media_text_pairs,
    "url_filter": q_url_filter,
    "dataset_card": q_dataset_card,
    "pipeline_media_features": q_pipeline_media_features,
    # ---- r05-recorded (CORRECTNESS_r05 50/50); stay in-window while
    # slots remain ----
    "dedup_incremental_bloom": q_dedup_incremental_bloom,
    "similarity_batch_topk": q_similarity_batch_topk,
    "pipeline_pack_corpus": q_pipeline_pack_corpus,
    "fingerprint": q_fingerprint,
    # relational (B9–B23)
    "agg_median_by_lang": q_agg_median_by_lang,
    "describe_two_level": q_describe_two_level,
    "explode_tokens_topk": q_explode_tokens_topk,
    "filter_topk": q_filter_topk,
    "derived_columns": q_derived_columns,
    "substring_span_join": q_substring_span_join,
    "sample_exact_n": q_sample_exact_n,
    "row_number_enumerate": q_row_number_enumerate,
    "union_accumulate": q_union_accumulate,
    "null_fill_coalesce": q_null_fill_coalesce,
    "cast_rename_project": q_cast_rename_project,
    # extraction kernel through Spark (oracle-checked span equality;
    # byte-for-byte kernel + wiki goldens pin these in pytest)
    "extract_flagship": q_extract_flagship,
    "extract_interleaved_media": q_extract_interleaved_media,
    "extract_tag_histogram": q_extract_tag_histogram,
    "extract_text_roundtrip": q_extract_text_roundtrip,
    "extract_span_stats": q_extract_span_stats,
    "extract_br_conversion": q_extract_br_conversion,
    "extract_config_comparison": q_extract_config_comparison,
    "extract_density_prune": q_extract_density_prune,
    "extract_pdf": q_extract_pdf,
    "extract_pdf_interleaved": q_extract_pdf_interleaved,
    "token_counts_gpt2": q_token_counts_gpt2,
    # ---- tail: recorded green in CORRECTNESS_r05 (50/50) AND pinned
    # by dedicated pytests; rotate back per the rule above ----
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_candidates": q_dedup_minhash_candidates,
    "dedup_simhash": q_dedup_simhash,
    "dedup_clusters": q_dedup_clusters,
    "similarity_bruteforce_topk": q_similarity_bruteforce,
    "similarity_lsh_topk": q_similarity_lsh,
    "similarity_ivf_topk": q_similarity_ivf,
    "similarity_pq_topk": q_similarity_pq,
    "embedding_near_dups": q_embedding_near_dups,
    "lang_id_heuristic": q_lang_id,
    "quality_scores": q_quality_scores,
    "token_counts": q_token_counts,
    "token_counts_bpe": q_token_counts_bpe,
    "repetition_ratio": q_repetition_ratio,
    "scrub_pii": q_scrub_pii,
    "remove_boilerplate_lines": q_remove_boilerplate_lines,
    "sample_stratified": q_sample_stratified,
    "sample_mixture": q_sample_mixture,
    "decontaminate": q_decontaminate,
    "pack_sequences": q_pack_sequences,
    "normalize_text": q_normalize_text,
    "chunk_documents": q_chunk_documents,
    "assign_shards": q_assign_shards,
    "topk_per_group": q_topk_per_group,
    "neardup_survivors": q_neardup_survivors,
    "pipeline_clean_corpus": q_pipeline_clean_corpus,
}

ORACLES = {
    "bm25_topk": ORACLE_BM25_TOPK,
    "bm25_batch_topk": ORACLE_BM25_BATCH,
    "tfidf_top_terms": ORACLE_TFIDF_TOP_TERMS,
    "icelite_matview_postings": ORACLE_ICELITE_MATVIEW,
    "events_range_join": ORACLE_EVENTS_RANGE_JOIN,
    "dedup_keep_best": ORACLE_DEDUP_KEEP_BEST,
    "icelite_rollback": ORACLE_ICELITE_ROLLBACK,
    "icelite_partitions_meta": ORACLE_ICELITE_PARTITIONS,
    "icelite_zorder_prune": ORACLE_ICELITE_ZORDER,
    "icelite_rewrite": ORACLE_ICELITE_REWRITE,
    "similarity_sq8_topk": ORACLE_SIMILARITY_SQ8,
    "icelite_sql_view": ORACLE_ICELITE_SQL_VIEW,
    "icelite_wap": ORACLE_ICELITE_WAP,
    "icelite_tag_release": ORACLE_ICELITE_TAG,
    "pack_interleaved": ORACLE_PACK_INTERLEAVED,
    "icelite_point_lookup": ORACLE_ICELITE_POINT_LOOKUP,
    "icelite_changelog": ORACLE_ICELITE_CHANGELOG,
    "icelite_delete_read": ORACLE_ICELITE_DELETE,
    "icelite_stats_prune": ORACLE_ICELITE_PRUNE,
    "semantic_dedup": ORACLE_SEMANTIC_DEDUP,
    "dsir_select": ORACLE_DSIR,
    "icelite_rebucket_resume": ORACLE_ICELITE_REBUCKET,
    "dedup_paragraphs": ORACLE_DEDUP_PARAGRAPHS,
    "dedup_neardup_incremental": ORACLE_NEARDUP_INCREMENTAL,
    "extract_flagship": ORACLE_FLAGSHIP,
    "extract_interleaved_media": ORACLE_INTERLEAVED,
    "extract_tag_histogram": ORACLE_TAG_HISTOGRAM,
    "extract_text_roundtrip": ORACLE_TEXT_ROUNDTRIP,
    "extract_span_stats": ORACLE_SPAN_STATS,
    "extract_br_conversion": ORACLE_BR_CONVERSION,
    "extract_config_comparison": ORACLE_CONFIG_COMPARISON,
    "extract_density_prune": ORACLE_DENSITY_PRUNE,
    "extract_pdf": ORACLE_EXTRACT_PDF,
    "extract_pdf_interleaved": ORACLE_EXTRACT_PDF_INTERLEAVED,
    "agg_median_by_lang": ORACLE_AGG_MEDIAN,
    "describe_two_level": ORACLE_DESCRIBE_TWO_LEVEL,
    "explode_tokens_topk": ORACLE_EXPLODE_TOKENS,
    "filter_topk": ORACLE_FILTER_TOPK,
    "derived_columns": ORACLE_DERIVED,
    "substring_span_join": ORACLE_SUBSTRING_JOIN,
    "sample_exact_n": ORACLE_SAMPLE,
    "row_number_enumerate": ORACLE_ROW_NUMBER,
    "union_accumulate": ORACLE_UNION,
    "null_fill_coalesce": ORACLE_NULL_FILL,
    "cast_rename_project": ORACLE_CAST_RENAME,
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_substring": ORACLE_DEDUP_SUBSTRING,
    "dedup_substring_removal": ORACLE_DEDUP_SUBSTRING_REMOVAL,
    "dedup_incremental": ORACLE_DEDUP_INCREMENTAL,
    "dedup_incremental_bloom": ORACLE_DEDUP_INCREMENTAL,  # provably same result
    "dedup_ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "similarity_bruteforce_topk": ORACLE_SIMILARITY,
    "similarity_batch_topk": ORACLE_SIMILARITY_BATCH,
    "lang_id_heuristic": ORACLE_LANG_ID,
    "quality_scores": ORACLE_QUALITY,
    "quality_classifier": ORACLE_QUALITY_CLASSIFIER,
    "gopher_rules": ORACLE_GOPHER_RULES,
    "temperature_resample": ORACLE_TEMPERATURE_RESAMPLE,
    "perplexity_scores": ORACLE_PERPLEXITY,
    "media_text_pairs": ORACLE_MEDIA_TEXT_PAIRS,
    "url_filter": ORACLE_URL_FILTER,
    "dataset_card": ORACLE_DATASET_CARD,
    "pipeline_media_features": ORACLE_PIPELINE_MEDIA,
    "token_counts": ORACLE_TOKEN_COUNTS,
    "token_counts_bpe": _oracle_token_counts_bpe(),
    "token_counts_gpt2": ORACLE_TOKEN_COUNTS_GPT2,
    "fingerprint": ORACLE_FINGERPRINT,
    "multimodal_features": ORACLE_MULTIMODAL,
    "multimodal_resize": ORACLE_MULTIMODAL_RESIZE,
    "multimodal_frames": ORACLE_MULTIMODAL_FRAMES,
    "events_window_agg": ORACLE_EVENTS_WINDOW,
    "events_sessionize": ORACLE_EVENTS_SESSIONIZE,
    "events_asof_join": ORACLE_EVENTS_ASOF,
    "events_json_extract": ORACLE_EVENTS_JSON,
    "events_cube": ORACLE_EVENTS_CUBE,
    "join_broadcast_revenue": ORACLE_JOIN_REVENUE,
    "anti_join_resume": ORACLE_ANTI_JOIN,
    "embedding_near_dups": ORACLE_EMBEDDING_NEAR_DUPS,
    "dedup_minhash_candidates": ORACLE_MINHASH_CANDIDATES,
    "dedup_simhash": ORACLE_SIMHASH,
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "similarity_lsh_topk": ORACLE_SIMILARITY_LSH,
    "similarity_ivf_topk": ORACLE_SIMILARITY_LSH,  # same planted construction
    "similarity_pq_topk": ORACLE_SIMILARITY_PQ,
    "similarity_ivfpq_topk": ORACLE_SIMILARITY_PQ,  # same planted construction
    "repetition_ratio": ORACLE_REPETITION,
    "scrub_pii": _oracle_scrub_pii(),
    "remove_boilerplate_lines": ORACLE_BOILERPLATE_LINES,
    "sample_stratified": ORACLE_SAMPLE_STRATIFIED,
    "sample_mixture": ORACLE_SAMPLE_MIXTURE,
    "decontaminate": ORACLE_DECONTAMINATE,
    "pack_sequences": ORACLE_PACK_SEQUENCES,
    "normalize_text": ORACLE_NORMALIZE_TEXT,
    "chunk_documents": ORACLE_CHUNK_DOCUMENTS,
    "assign_shards": ORACLE_ASSIGN_SHARDS,
    "topk_per_group": ORACLE_TOPK_PER_GROUP,
    "neardup_survivors": ORACLE_NEARDUP_SURVIVORS,
    "pipeline_clean_corpus": _oracle_pipeline(),
    "pipeline_pack_corpus": ORACLE_PIPELINE_PACK,
}
