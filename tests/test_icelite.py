"""icelite snapshot/resume semantics (reference B8 skip-if-done +
north_rule per-partition lineage)."""

import os

from pyspark.sql import functions as F

from mini_html_parser_spark.plans.icelite import IceliteTable


def _df(spark, lo, hi, n_buckets=4):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
            F.pmod(F.col("id"), F.lit(n_buckets)).cast("int").alias("bucket"),
        )
    )


def test_commit_read_lineage(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "tbl"))
    snap = t.commit_append(_df(spark, 0, 100), metrics={"docs_parsed": 100})
    assert snap["sequence"] == 0
    assert snap["total_rows"] == 100
    assert sorted(snap["bucket_rows"]) == ["0", "1", "2", "3"]
    assert sum(snap["bucket_rows"].values()) == 100
    back = t.read(spark)
    assert back.count() == 100
    assert t.current_snapshot()["metrics"]["docs_parsed"] == 100
    # compact commit: exactly one data file per non-empty bucket (the
    # small-files guard — a partitionBy write from K tasks would
    # otherwise emit up to K files per bucket)
    import glob

    for b in range(4):
        files = glob.glob(os.path.join(t.path, "data", "snap-0", f"bucket={b}", "*.parquet"))
        assert len(files) == 1, (b, files)


def test_resume_skips_committed_buckets(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "tbl2"))
    # first run commits only buckets 0 and 1 (simulated partial run)
    first = _df(spark, 0, 100).filter(F.col("bucket") < 2)
    t.commit_append(first)
    assert t.committed_buckets() == {0, 1}

    # resume: pending rows are exactly buckets 2,3
    pending = t.filter_pending(_df(spark, 0, 100))
    got_buckets = {r["bucket"] for r in pending.select("bucket").distinct().collect()}
    assert got_buckets == {2, 3}

    snap2 = t.commit_append(pending)
    assert snap2["sequence"] == 1
    assert snap2["parent_id"] == t.snapshots()[0]["snapshot_id"]

    # full table now visible, no duplicates
    back = t.read(spark)
    assert back.count() == 100
    assert back.select("doc_id").distinct().count() == 100


def test_empty_commit_is_noop(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "tbl3"))
    t.commit_append(_df(spark, 0, 10))
    before = len(t.snapshots())
    out = t.commit_append(t.filter_pending(_df(spark, 0, 10)))
    assert out is None
    assert len(t.snapshots()) == before


def test_resume_reuses_recorded_bucket_layout(spark, tmp_path):
    """Bucket ids are pmod(xxhash64(doc_id), n_buckets) — a resume
    with a different parallelism must reuse the RECORDED n_buckets or
    it remaps ids against the committed set (silently skipping or
    re-extracting documents).  The manifest records the layout; a
    conflicting explicit request errors (round-1 advice)."""
    import pytest

    from mini_html_parser_spark.datagen import generate_documents
    from mini_html_parser_spark.pipeline import run_extraction_job

    out = str(tmp_path / "tbl5")
    docs = generate_documents(spark, 25)

    r1 = run_extraction_job(spark, docs, out, parallelism=2)
    t = IceliteTable(out)
    layout = t.partitioning()
    assert layout is not None and layout["n_buckets"] == 4
    n_first = t.read(spark).count()
    assert r1["metrics"]["docs_parsed"] == 25

    # resume with NO explicit parallelism on a "bigger cluster"
    # (defaultParallelism here != 2): everything is already committed,
    # so the job must find zero pending rows — if the layout were
    # recomputed from the current parallelism, doc ids would remap to
    # uncommitted bucket ids and re-extract as duplicates
    r2 = run_extraction_job(spark, docs, out)
    assert r2["snapshot"] is None
    back = t.read(spark)
    assert back.count() == n_first
    assert back.select("doc_id").distinct().count() == 25

    # an explicitly conflicting layout must error, not silently remap
    with pytest.raises(ValueError, match="resume layout mismatch"):
        run_extraction_job(spark, docs, out, parallelism=8)


def test_compact_rewrites_snapshots(spark, tmp_path):
    """compact() folds N snapshots into one: same rows, same committed
    buckets, same recorded layout, one read scan afterwards."""
    t = IceliteTable(str(tmp_path / "tbl6"))
    t.commit_append(_df(spark, 0, 40), partitioning={"n_buckets": 4})
    t.commit_append(_df(spark, 40, 70))
    t.commit_append(_df(spark, 70, 100))
    assert len(t.snapshots()) == 3
    before = {r["doc_id"] for r in t.read(spark).select("doc_id").collect()}

    manifest = t.compact(spark)
    assert manifest["compacted"] and manifest["metrics"]["compacted_snapshots"] == 3
    assert len(t.snapshots()) == 1
    assert t.committed_buckets() == {0, 1, 2, 3}
    assert t.partitioning() == {"n_buckets": 4}
    after = {r["doc_id"] for r in t.read(spark).select("doc_id").collect()}
    assert after == before and len(after) == 100
    # compacting a single snapshot is a no-op
    assert t.compact(spark) is None


def test_manifest_is_commit_point(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "tbl4"))
    t.commit_append(_df(spark, 0, 20))
    # simulate a crashed second write: data dir exists, no manifest
    os.makedirs(os.path.join(t.path, "data", "snap-1", "bucket=0"), exist_ok=True)
    assert t.read(spark).count() == 20  # uncommitted dir invisible
