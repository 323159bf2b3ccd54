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




def test_streaming_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState: first-seen wins across micro-batches."""
    import pandas as pd
    from mini_html_parser_spark.streaming.extract_stream import (
        read_document_stream, streaming_exact_dedup,
    )

    # state-store partitions = shuffle partitions at first run; keep
    # them minimal or the per-partition store init dominates (minutes)
    spark = spark.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "2")

    inp = str(tmp_path / "sin")
    out = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")

    def doc(doc_id, body):
        return {"doc_id": doc_id,
                "spans": [{"kind": "html", "text": body, "media_ref": "", "offset": 0}]}

    from mini_html_parser_spark.operators.extract import DOCUMENTS_SCHEMA
    batch1 = pd.DataFrame([doc("a", "<p>one</p>"), doc("b", "<p>two</p>"),
                           doc("c", "<p>one</p>")])  # c dups a
    spark.createDataFrame(batch1, DOCUMENTS_SCHEMA).coalesce(1).write.mode("append").parquet(inp)

    deduped = streaming_exact_dedup(read_document_stream(spark, inp))
    q = (deduped.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()
    got1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert len(got1) == 2 and "b" in got1 and ("a" in got1 or "c" in got1)

    # second wave: all duplicates of wave 1 + one new doc
    batch2 = pd.DataFrame([doc("d", "<p>one</p>"), doc("e", "<p>three</p>")])
    spark.createDataFrame(batch2, DOCUMENTS_SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    q2 = (streaming_exact_dedup(read_document_stream(spark, inp))
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt).outputMode("append")
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    q2.stop()
    rows = spark.read.parquet(out).collect()
    ids = {r["doc_id"] for r in rows}
    assert "e" in ids and "d" not in ids   # state survived the restart
    assert len(rows) == 3
