"""Partial compaction (Iceberg ``rewrite_data_files`` with a filter):
per-bucket rewrites that fold small files and the buckets' share of
the equality deletes, leaving the rest of the table untouched — the
only maintenance shape that works at 100 TB — and its interplay with
time travel, incremental/CDC reads, rollback, metadata tables,
concurrency and full compaction."""

import os

import pytest
from pyspark.sql import functions as F

from mini_html_parser_spark.plans.icelite import IceliteTable


def _df(spark, lo, hi, n_buckets=4, prefix="text-"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(prefix), F.col("id")).alias("text"),
        F.pmod(F.col("id"), F.lit(n_buckets)).cast("int").alias("bucket"),
    )


def _keys(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "doc_id bigint")


def _state(df):
    return {r["doc_id"]: r["text"] for r in df.select("doc_id", "text").collect()}


def test_rewrite_folds_files_and_deletes_per_bucket(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "t"))
    for k in range(3):  # fragment: 3 files per bucket
        t.commit_append(_df(spark, 40 * k, 40 * (k + 1)))
    t.commit_delete(_keys(spark, [0, 1, 2, 3]))  # one key per bucket
    want = _state(t.read(spark))
    assert len(want) == 116

    man = t.rewrite(spark, buckets={0, 1})
    assert man is not None
    assert man["rewrites_buckets"] == [0, 1]
    assert len(man["replaces"]) == 6  # 3 files x 2 buckets superseded

    # logical state identical; physical layout folded for 0,1 only
    assert _state(t.read(spark)) == want
    by_bucket: dict[int, int] = {}
    for f in t.files_summary():
        by_bucket[f["bucket"]] = by_bucket.get(f["bucket"], 0) + 1
    assert by_bucket == {0: 1, 1: 1, 2: 3, 3: 3}
    # the rewritten files physically exclude the folded delete keys
    rewritten = [
        os.path.join(t.path, f["file"])
        for f in t.files_summary()
        if f["sequence"] == man["sequence"]
    ]
    raw = spark.read.parquet(*rewritten)
    assert raw.filter(F.col("doc_id").isin(0, 1)).count() == 0

    # time travel BELOW the rewrite reads the ORIGINAL files
    pre = t.snapshots()[-2]  # the delete commit, just under the rewrite
    past = t.read(spark, as_of_snapshot=pre["snapshot_id"])
    assert _state(past) == want
    assert any("bucket=0" in f and man["data_dir"] not in f
               for f in past.inputFiles())
    # ...while the current read never touches a replaced file (and
    # does read the rewrite's dir — positive control against a
    # vacuously-true suffix check; inputFiles URIs are file:///abs)
    cur_files = t.read(spark).inputFiles()
    assert any(man["data_dir"] in f for f in cur_files)
    assert not any(
        f.endswith(p) for f in cur_files for p in man["replaces"]
    )

    # partitions: rewritten bucket counted once, others still additive
    parts = {p["bucket"]: p for p in t.partitions_summary()}
    assert parts[0]["rows"] == 29 and parts[0]["n_files"] == 1
    assert parts[2]["rows"] == 30 and parts[2]["n_files"] == 3
    assert parts[0]["n_snapshots"] == 1 and parts[2]["n_snapshots"] == 3
    kinds = [r["kind"] for r in t.history_df(spark).orderBy("sequence").collect()]
    assert kinds == ["append", "append", "append", "delete", "rewrite"]


def test_rewrite_is_not_a_logical_change(spark, tmp_path):
    """Incremental scans and the CDC changelog skip rewrite manifests:
    maintenance re-represents old rows, it never inserts them."""
    t = IceliteTable(str(tmp_path / "t"))
    a = t.commit_append(_df(spark, 0, 40))
    t.commit_append(_df(spark, 40, 60, prefix="b-"))
    man = t.rewrite(spark, buckets={0, 1, 2, 3})
    assert man is not None

    inc = t.read_incremental(spark, after_snapshot=a["snapshot_id"])
    assert sorted(r["doc_id"] for r in inc.collect()) == list(range(40, 60))

    ch = t.read_changes(spark)
    assert ch.filter(F.col("_change_type") == "delete").count() == 0
    ins = ch.filter(F.col("_change_type") == "insert")
    assert ins.count() == 60  # attributed to the ORIGINAL snapshots
    assert ins.filter(
        F.col("_commit_sequence") >= man["sequence"]
    ).count() == 0


def test_rewrite_fully_deleted_bucket_to_zero_files(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 40))
    t.commit_delete(
        _df(spark, 0, 40).filter(F.col("bucket") == 0).select("doc_id")
    )
    man = t.rewrite(spark, buckets={0})
    assert man is not None and man["data_files"] == []
    assert {f["bucket"] for f in t.files_summary()} == {1, 2, 3}
    got = sorted(r["doc_id"] for r in t.read(spark).collect())
    assert got == [i for i in range(40) if i % 4 != 0]
    # idempotent: nothing live remains in bucket 0
    assert t.rewrite(spark, buckets={0}) is None


def test_rewrite_rollback_restores_originals(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 40))
    tip = t.commit_append(_df(spark, 40, 80))
    want = _state(t.read(spark))
    assert t.rewrite(spark, buckets={0}) is not None
    assert len([f for f in t.files_summary() if f["bucket"] == 0]) == 1

    t.rollback(tip["snapshot_id"])
    assert _state(t.read(spark)) == want
    # the drop map is computed per read: truncating the rewrite
    # resurrects the original two files of bucket 0
    assert len([f for f in t.files_summary() if f["bucket"] == 0]) == 2


def test_rewrite_aborts_when_history_advances(spark, tmp_path):
    """A delete committed between the rewrite's read and its publish
    would be silently folded-out for the rewritten rows — rewrite uses
    the same require_parent abort as compact()."""
    t = IceliteTable(str(tmp_path / "race"))
    t.commit_append(_df(spark, 0, 20))
    orig = t._commit_manifest

    def racing_commit(manifest, require_parent=False):
        if require_parent and not getattr(racing_commit, "fired", False):
            racing_commit.fired = True
            t._commit_manifest = orig  # the racing delete commits clean
            t.commit_delete(_keys(spark, [5]))
            t._commit_manifest = racing_commit
        return orig(manifest, require_parent)

    t._commit_manifest = racing_commit
    assert t.rewrite(spark, buckets={0, 1, 2, 3}) is None  # aborted
    t._commit_manifest = orig
    assert t.read(spark).count() == 19  # the delete was not lost
    # aborted rewrite leaked no data dir
    referenced = set()
    for s in t.snapshots():
        if s.get("data_dir"):
            referenced.add(os.path.basename(s["data_dir"]))
        for rel in (s.get("data_files") or []) + (s.get("delete_files") or []):
            referenced.add(os.path.normpath(rel).split(os.sep)[1])
    assert set(os.listdir(os.path.join(t.path, "data"))) == referenced
    # quiet retry succeeds and folds the delete
    assert t.rewrite(spark, buckets={0, 1, 2, 3}) is not None
    assert t.read(spark).count() == 19


def test_rewrite_then_key_index_refresh_converges(spark, tmp_path):
    """After a rewrite, index_keys must enumerate LIVE files only:
    replaced files listed as 'missing' would never be scanned (the
    build applies the same drop rule), so every refresh would re-scan
    those snapshots forever."""
    t = IceliteTable(str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 40))
    t.commit_append(_df(spark, 40, 80))
    t.index_keys(spark, col="doc_id", n_bits=1 << 13)
    assert t.rewrite(spark, buckets={0, 1, 2, 3}) is not None

    rep = t.index_keys(spark)          # picks up the rewrite's files
    assert rep["indexed_files"] == 4   # one new file per bucket
    assert rep["total_files"] == 4     # live census, replaced excluded
    rep2 = t.index_keys(spark)         # converged: nothing missing
    assert rep2["indexed_files"] == 0
    # point lookups stay exact through the rewrite
    hit = t.read(spark, prune=[("doc_id", "in", 5)])
    assert hit.filter(F.col("doc_id") == 5).count() == 1


def test_rewrite_clustered_and_full_compact_reclaims(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "t"))
    df = _df(spark, 0, 800, n_buckets=2).withColumn(
        "n_chars", F.pmod(F.xxhash64("doc_id"), F.lit(10_000)).cast("int")
    )
    t.commit_append(df)
    t.commit_append(
        _df(spark, 800, 1600, n_buckets=2).withColumn(
            "n_chars",
            F.pmod(F.xxhash64("doc_id"), F.lit(10_000)).cast("int"),
        )
    )
    # clustered partial rewrite: bucket 0 becomes stats-skippable
    man = t.rewrite(spark, buckets={0}, sort_within_buckets=["n_chars"])
    assert man is not None
    pruned = t.read(spark, prune=[("n_chars", "between", 100, 300)])
    all_files = t.read(spark).inputFiles()
    assert len(pruned.inputFiles()) < len(all_files)
    got = sorted(
        r["doc_id"]
        for r in pruned.filter(F.col("n_chars").between(100, 300)).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in t.read(spark)
        .filter(F.col("n_chars").between(100, 300))
        .collect()
    )
    assert got == want

    # a later FULL compact supersedes originals + rewrite; vacuum
    # reclaims every superseded dir
    n_before = len(t.read(spark).collect())
    t.compact(spark)
    assert len(t.read(spark).collect()) == n_before
    rep = t.vacuum(grace_sec=0)
    live = {os.path.basename(s["data_dir"]) for s in t.snapshots()}
    assert set(os.listdir(os.path.join(t.path, "data"))) == live
    assert rep["removed"]  # the originals + the partial rewrite's dir

    # branches stage data, they don't run maintenance
    t.create_branch("wap")
    with pytest.raises(NotImplementedError):
        t.branch("wap").rewrite(spark, buckets={0})
    t.delete_branch("wap")
