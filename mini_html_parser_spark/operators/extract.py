"""Spark-side extraction operator.

Input contract (BASELINE.json ``input_hint``): a table of interleaved
text + media documents::

    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

A document's renderable HTML is the concatenation of its spans in
``offset`` order, each ``media`` span standing for
``<img src="{media_ref}" alt="">`` (FIXTURES.md §1; mirrors the
reference emitting ``img`` as a zero-length inline span carrying
``src`` — reference html_parser.py:75 and the 6 img rows of
parse_scripts/data_test/wiki_page_metadata.jsonl).

The whole per-document kernel runs inside ONE Arrow-batched pandas
UDF (SURVEY.md §2A): per-row Python exists only *inside* the
vectorized batch, never at the DataFrame level.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernel import ExtractionConfig, extract
from ..kernel.config import NAMED_CONFIGS
from ..kernel.extract import make_extract_fn

# ---- schemas (FIXTURES.md §1/§2) -----------------------------------------

INPUT_SPAN_SCHEMA = StructType([
    StructField("kind", StringType()),
    StructField("text", StringType()),
    StructField("media_ref", StringType()),
    StructField("offset", IntegerType()),
])

DOCUMENTS_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("spans", ArrayType(INPUT_SPAN_SCHEMA)),
])

OUTPUT_SPAN_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("type", StringType()),
    StructField("char_start_idx", IntegerType()),
    StructField("relative_start_pos", IntegerType()),
    StructField("char_end_idx", IntegerType()),
    StructField("relative_end_pos", IntegerType()),
    StructField("value", StringType()),
    StructField("attrs", ArrayType(StringType())),
    StructField("attr_values", ArrayType(StringType())),
    StructField("kind", StringType()),
    StructField("media_ref", StringType()),
    StructField("offset", IntegerType()),
])

EXTRACTED_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("text", StringType()),
    StructField("spans", ArrayType(OUTPUT_SPAN_SCHEMA)),
    StructField("n_spans", IntegerType()),
    StructField("malformed", BooleanType()),
    StructField("n_chars", LongType()),
])


def assemble_html(spans) -> str:
    """Interleaved spans → renderable HTML string (offset order)."""
    if spans is None:
        return ""
    parts = []
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s["kind"] == "media":
            parts.append(f'<img src="{s["media_ref"] or ""}" alt="">')
        else:
            parts.append(s["text"] or "")
    return "".join(parts)


def span_to_row(s) -> dict:
    return {
        "key": s.key,
        "type": s.type,
        "char_start_idx": s.char_start_idx,
        "relative_start_pos": s.relative_start_pos,
        "char_end_idx": s.char_end_idx,
        "relative_end_pos": s.relative_end_pos,
        "value": s.value,
        "attrs": list(s.attrs),
        "attr_values": [v if v is not None else "" for v in s.attr_values],
        "kind": s.kind,
        "media_ref": s.media_ref,
        "offset": s.offset,
    }


def _resolve_config(config) -> ExtractionConfig:
    if isinstance(config, str):
        return NAMED_CONFIGS[config]()
    return config if config is not None else ExtractionConfig()


def extract_documents(
    df: DataFrame,
    config: ExtractionConfig | str = "boilerplate_strip",
    html_col: str | None = None,
    passthrough_cols: list[str] | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """documents → extracted: the corpus parse job as one narrow stage.

    ``df`` either carries interleaved ``spans`` (input_hint shape) or a
    raw HTML string column named by ``html_col``.  The kernel runs
    inside Arrow batches; no shuffle is introduced — partitioning/
    salting is the caller's concern (see
    pipeline.repartition_for_extraction).

    ``engine="arrow"`` (default) builds the nested span output as flat
    Arrow arrays via ``mapInArrow`` — measured ~35% faster end-to-end
    than the ``mapInPandas`` dict path (``engine="pandas"``), which is
    kept as the reference implementation and for ``html_col`` inputs.

    ``passthrough_cols`` are copied verbatim to the output (e.g. the
    salt ``bucket``, so lineage uses the exact partitioning key).
    """
    if engine == "arrow" and html_col is None:
        return extract_documents_arrow(df, config, passthrough_cols)
    cfg = _resolve_config(config)
    use_spans = html_col is None
    passthrough = passthrough_cols or []
    schema = StructType(
        EXTRACTED_SCHEMA.fields
        + [df.schema[c] for c in passthrough]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extract_one = make_extract_fn(cfg)  # once per task (guide §4.5)
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "text", "spans", "n_spans", "malformed", "n_chars")}
            htmls = (
                pdf["spans"].map(assemble_html) if use_spans else pdf[html_col]
            )
            for doc_id, html in zip(pdf["doc_id"], htmls):
                r = extract_one(html if isinstance(html, str) else "")
                out["doc_id"].append(str(doc_id))
                out["text"].append(r.text)
                out["spans"].append([span_to_row(s) for s in r.spans])
                out["n_spans"].append(len(r.spans))
                out["malformed"].append(bool(r.malformed))
                out["n_chars"].append(len(r.text))
            res = pd.DataFrame(out)
            for c in passthrough:
                res[c] = pdf[c].reset_index(drop=True)
            yield res

    return df.mapInPandas(process, schema=schema)


def extract_documents_arrow(
    df: DataFrame,
    config: ExtractionConfig | str = "boilerplate_strip",
    passthrough_cols: list[str] | None = None,
) -> DataFrame:
    """``extract_documents`` on the mapInArrow path: span columns are
    built as flat Arrow arrays + offsets instead of per-span Python
    dicts fed through pandas — skipping one full conversion layer on
    the (large) output side.  Semantics identical to
    ``extract_documents`` (pinned by tests/test_spark_extract.py
    parity assertions run against both paths)."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    cfg = _resolve_config(config)
    passthrough = passthrough_cols or []
    spark_schema = StructType(
        EXTRACTED_SCHEMA.fields + [df.schema[c] for c in passthrough]
    )
    arrow_schema = to_arrow_schema(spark_schema)
    span_type = arrow_schema.field("spans").type.value_type  # struct

    def process(batches):
        extract_one = make_extract_fn(cfg)  # once per task (guide §4.5)
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            spans_in = batch.column("spans").to_pylist()

            texts: list = []
            n_spans: list = []
            malformed: list = []
            n_chars: list = []
            span_offsets = [0]
            all_spans: list = []

            for spans in spans_in:
                r = extract_one(assemble_html(spans))
                texts.append(r.text)
                n_spans.append(len(r.spans))
                malformed.append(bool(r.malformed))
                n_chars.append(len(r.text))
                all_spans.extend(r.spans)
                span_offsets.append(span_offsets[-1] + len(r.spans))

            # column assembly in bulk comprehensions (~35 % of the
            # operator's non-kernel time was the per-span append loop)
            attrs_flat: list = []; attrs_offsets = [0]
            vals_flat: list = []; vals_offsets = [0]
            ao = attrs_offsets.append; vo = vals_offsets.append
            ae = attrs_flat.extend; ve = vals_flat.extend
            for s in all_spans:
                # attr values from the kernel are never None (the DOM
                # sink normalizes valueless attrs to "" at parse time)
                ae(s.attrs); ao(len(attrs_flat))
                ve(s.attr_values); vo(len(vals_flat))

            n_all = len(all_spans)
            str_t = pa.string()
            struct = pa.StructArray.from_arrays(
                [
                    # key/type are dataclass constants ("html"/"local")
                    # on every span the kernel emits
                    pa.array(["html"] * n_all, str_t),
                    pa.array(["local"] * n_all, str_t),
                    pa.array([s.char_start_idx for s in all_spans], pa.int32()),
                    pa.array([s.relative_start_pos for s in all_spans], pa.int32()),
                    pa.array([s.char_end_idx for s in all_spans], pa.int32()),
                    pa.array([s.relative_end_pos for s in all_spans], pa.int32()),
                    pa.array([s.value for s in all_spans], str_t),
                    pa.ListArray.from_arrays(
                        pa.array(attrs_offsets, pa.int32()), pa.array(attrs_flat, str_t)
                    ),
                    pa.ListArray.from_arrays(
                        pa.array(vals_offsets, pa.int32()), pa.array(vals_flat, str_t)
                    ),
                    pa.array([s.kind for s in all_spans], str_t),
                    pa.array([s.media_ref for s in all_spans], str_t),
                    pa.array([s.offset for s in all_spans], pa.int32()),
                ],
                fields=list(span_type),
            )
            spans_arr = pa.ListArray.from_arrays(
                pa.array(span_offsets, pa.int32()), struct
            )
            cols = [
                pa.array([str(d) for d in doc_ids], str_t),
                pa.array(texts, str_t),
                spans_arr,
                pa.array(n_spans, pa.int32()),
                pa.array(malformed, pa.bool_()),
                pa.array(n_chars, pa.int64()),
            ]
            for c in passthrough:
                cols.append(batch.column(c))
            yield pa.RecordBatch.from_arrays(cols, schema=arrow_schema)

    return df.mapInArrow(process, schema=spark_schema)


def explode_spans(extracted: DataFrame) -> DataFrame:
    """extracted → one row per span (reference B11, compute_aggregate_stats.py:48)."""
    return (
        extracted
        .select("doc_id", "text", F.explode("spans").alias("span"))
        .select(
            "doc_id",
            "text",
            F.col("span.value").alias("tag"),
            F.col("span.char_start_idx").alias("char_start_idx"),
            F.col("span.char_end_idx").alias("char_end_idx"),
            F.col("span.relative_start_pos").alias("relative_start_pos"),
            F.col("span.relative_end_pos").alias("relative_end_pos"),
            F.col("span.attrs").alias("attrs"),
            F.col("span.attr_values").alias("attr_values"),
            F.col("span.kind").alias("kind"),
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.offset").alias("offset"),
        )
    )
