"""Materialized-view maintenance over the icelite changelog
(plans/matview.py): a BM25 postings table that tracks the source
corpus through appends, upserts and deletes exactly once."""

import os

from pyspark.sql import functions as F

from mini_html_parser_spark.plans.icelite import IceliteTable
from mini_html_parser_spark.plans.matview import (
    applied_ids,
    maintain_derived,
    postings_transform,
)
from mini_html_parser_spark.operators import retrieval as R


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, int(i) % 2) for i, t in rows],
        "doc_id long, text string, bucket int",
    )


def _bm25(spark, table, q="join scan"):
    postings = table.read(spark).select("doc_id", "dl", "term", "tf")
    return [
        (r["doc_id"], r["bm25"])
        for r in R.bm25_topk(None, q, k=10, postings=postings).collect()
    ]


def _rebuild(spark, source, q="join scan"):
    docs = source.read(spark).select("doc_id", "text")
    return [
        (r["doc_id"], r["bm25"])
        for r in R.bm25_topk(docs, q, k=10).collect()
    ]


def test_postings_matview_tracks_source_exactly_once(spark, tmp_path):
    src = IceliteTable(str(tmp_path / "src"))
    pv = IceliteTable(str(tmp_path / "postings"))
    tr = postings_transform(n_buckets=2)

    # 1) initial load
    src.commit_append(_docs(spark, [
        (1, "spark shuffle join"), (2, "join join filter scan scan"),
        (3, "parquet scan pushdown"),
    ]))
    r = maintain_derived(spark, src, pv, tr)
    assert r == {"snapshots_applied": 1, "at_tip": False}
    assert _bm25(spark, pv) == _rebuild(spark, src)

    # 2) append + upsert (re-crawl doc 2 with new text) + takedown of 3,
    #    three separate source commits
    src.commit_append(_docs(spark, [(4, "window stream join")]))
    src.merge(_docs(spark, [(2, "completely new scan text")]))
    src.commit_delete(
        spark.createDataFrame([(3,)], "doc_id long"), key_col="doc_id"
    )
    r = maintain_derived(spark, src, pv, tr)
    assert r["snapshots_applied"] == 3
    assert _bm25(spark, pv) == _rebuild(spark, src)
    # retracted doc is GONE from the postings rows, not just outranked
    assert pv.read(spark).filter(F.col("doc_id") == 3).count() == 0

    # 3) replay the WHOLE window after the derived table compacted:
    #    reset the consumer checkpoint -> every snapshot replays ->
    #    every identity must be skipped (exactly-once through the
    #    stream_batch_ids fold)
    pv.compact(spark)
    before = sorted(
        tuple(x) for x in pv.read(spark).select(
            "doc_id", "term", "tf", "dl").collect()
    )
    os.remove(os.path.join(src.manifest_dir, "consumer-matview.json"))
    r = maintain_derived(spark, src, pv, tr)
    assert r["snapshots_applied"] >= 3
    after = sorted(
        tuple(x) for x in pv.read(spark).select(
            "doc_id", "term", "tf", "dl").collect()
    )
    assert before == after
    assert _bm25(spark, pv) == _rebuild(spark, src)

    # 4) at tip: no-op cycle
    assert maintain_derived(spark, src, pv, tr) == {
        "snapshots_applied": 0, "at_tip": True,
    }
    # identities survived compaction in the applied set
    assert any(str(i).startswith("mv:") for i in applied_ids(pv))


def test_matview_cli(spark, tmp_path, capsys):
    """table_tool matview: one scheduler-driven maintenance cycle per
    invocation, exactly-once across repeats."""
    import json

    from jobs.table_tool import main

    src = IceliteTable(str(tmp_path / "src"))
    src.commit_append(_docs(spark, [(1, "join scan"), (2, "scan filter")]))
    derived = str(tmp_path / "pv")

    assert main([str(tmp_path / "src"), "matview", "--derived", derived]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["snapshots_applied"] == 1
    assert IceliteTable(derived).read(spark).count() > 0

    # second run at tip: no-op
    assert main([str(tmp_path / "src"), "matview", "--derived", derived]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep == {"source": str(tmp_path / "src"), "derived": derived,
                   "snapshots_applied": 0, "at_tip": True}
