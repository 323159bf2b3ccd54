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


def test_manifest_is_commit_point(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "tbl4"))
    t.commit_append(_df(spark, 0, 20))
    # simulate a crashed second write: data dir exists, no manifest
    os.makedirs(os.path.join(t.path, "data", "snap-1", "bucket=0"), exist_ok=True)
    assert t.read(spark).count() == 20  # uncommitted dir invisible
