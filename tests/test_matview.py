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


def test_bm25_over_sorted_postings_table_prunes_files(spark, tmp_path):
    """Index-accelerated lexical retrieval end-to-end: BM25 over an
    icelite postings matview with term file-skipping.  After a
    sort-within-buckets(term) compaction each file covers a tight term
    slice, so the query's pruned scan reads strictly fewer files while
    returning EXACTLY the unpruned results (stats pruning is a
    superset guarantee; (N, avgdl) always computed unpruned)."""
    from mini_html_parser_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_table,
    )

    src = IceliteTable(str(tmp_path / "src"))
    pv = IceliteTable(str(tmp_path / "pv"))
    tr = postings_transform(n_buckets=2)
    # several commits => several files per bucket before the rewrite
    words = ["alpha", "beta", "gamma", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    for c in range(4):
        rows = [
            (c * 100 + i,
             " ".join(words[(i + j + c) % len(words)] for j in range(6)))
            for i in range(25)
        ]
        src.commit_append(_docs(spark, rows))
        maintain_derived(spark, src, pv, tr)

    pv.compact(spark, sort_within_buckets=["term"])

    q = "alpha juliet"
    expect = [
        (r["doc_id"], r["bm25"])
        for r in bm25_topk(
            None, q, k=10,
            postings=pv.read(spark).select("doc_id", "dl", "term", "tf"),
        ).collect()
    ]
    got_df = bm25_topk_table(pv, spark, q, k=10)
    got = [(r["doc_id"], r["bm25"]) for r in got_df.collect()]
    assert got == expect and len(got) == 10

    all_files = len(pv.read(spark).inputFiles())
    pruned_files = len(
        pv.read(spark, prune=[("term", "in", "alpha", "juliet")]).inputFiles()
    )
    assert 0 < pruned_files < all_files, (pruned_files, all_files)
