"""Streaming extraction: same operator, streaming plan, exactly-once
file sink with checkpoint resume."""

import os

from mini_html_parser_spark.datagen import generate_pandas
from mini_html_parser_spark.operators.extract import DOCUMENTS_SCHEMA
from mini_html_parser_spark.streaming.extract_stream import (
    extract_stream,
    read_document_stream,
    start_extraction_sink,
)


def _write_input(spark, path, lo, hi):
    pdf = generate_pandas(hi - lo, seed=42, start=lo)
    spark.createDataFrame(pdf, schema=DOCUMENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streaming_extraction_with_resume(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_input(spark, inp, 0, 10)
    stream = extract_stream(read_document_stream(spark, inp))
    assert stream.isStreaming
    q = start_extraction_sink(stream, out, ckpt, available_now=True)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 10

    # new files arrive; restart from checkpoint → only the delta is processed
    _write_input(spark, inp, 10, 15)
    q2 = start_extraction_sink(
        extract_stream(read_document_stream(spark, inp)), out, ckpt
    )
    q2.awaitTermination(120)
    result = spark.read.parquet(out)
    assert result.count() == 15
    assert result.select("doc_id").distinct().count() == 15  # exactly-once
    assert set(result.columns) == {
        "doc_id", "text", "spans", "n_spans", "malformed", "n_chars"
    }
