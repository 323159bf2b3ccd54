"""Snapshot rollback (Iceberg ``rollback_to_snapshot``): undoing a
bad commit without rewriting data, and its interplay with time
travel, CDC consumers, resume, tags, branches, compaction and
vacuum."""

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


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_rollback_restores_state_and_later_commits_build_on_it(
    spark, tmp_path
):
    t = IceliteTable(str(tmp_path / "tbl"))
    good = t.commit_append(_df(spark, 0, 100))
    bad = t.commit_append(_df(spark, 100, 150, prefix="poisoned-"))
    assert t.read(spark).count() == 150

    rb = t.rollback(good["snapshot_id"], metrics={"reason": "poisoned batch"})
    # metadata-only: no data dir, consumes the next sequence
    assert rb["sequence"] == bad["sequence"] + 1
    assert rb["rollback_to"] == good["sequence"]
    assert "data_dir" not in rb

    assert _ids(t.read(spark)) == list(range(100))
    # the truncated snapshot is gone from time travel (documented
    # divergence from Iceberg: truncated == expired)
    with pytest.raises(KeyError):
        t.read(spark, as_of_snapshot=bad["snapshot_id"])
    # ...but time travel to the rollback itself and to the target work
    assert t.read(spark, as_of_snapshot=rb["snapshot_id"]).count() == 100
    assert t.read(spark, as_of_snapshot=good["snapshot_id"]).count() == 100

    # later commits build on the restored state with increasing seqs
    nxt = t.commit_append(_df(spark, 150, 180))
    assert nxt["sequence"] == rb["sequence"] + 1
    assert _ids(t.read(spark)) == list(range(100)) + list(range(150, 180))
    seqs = [s["sequence"] for s in t.snapshots()]
    assert seqs == sorted(set(seqs))


def test_rollback_validation(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "tbl"))
    a = t.commit_append(_df(spark, 0, 10))
    b = t.commit_append(_df(spark, 10, 20))
    with pytest.raises(KeyError):
        t.rollback("no-such-snapshot")
    with pytest.raises(ValueError):
        t.rollback(b["snapshot_id"])  # already current
    t.rollback(a["snapshot_id"])
    # the truncated snapshot is no longer a legal rollback target
    with pytest.raises(KeyError):
        t.rollback(b["snapshot_id"])


def test_rollback_undoes_deletes_and_restores_resume_buckets(
    spark, tmp_path
):
    t = IceliteTable(str(tmp_path / "tbl"))
    a = t.commit_append(_df(spark, 0, 100))
    t.commit_delete(
        _df(spark, 0, 100).filter(F.col("doc_id") % 10 == 0).select("doc_id")
    )
    assert t.read(spark).count() == 90
    t.rollback(a["snapshot_id"])
    assert t.read(spark).count() == 100  # retraction undone, no rewrite

    # resume bookkeeping follows the live view: roll back a partial
    # ingest and its buckets become pending again
    t2 = IceliteTable(str(tmp_path / "tbl2"))
    base = t2.commit_append(_df(spark, 0, 100).filter(F.col("bucket") < 2))
    t2.commit_append(_df(spark, 0, 100).filter(F.col("bucket") == 2))
    assert t2.committed_buckets() == {0, 1, 2}
    t2.rollback(base["snapshot_id"])
    assert t2.committed_buckets() == {0, 1}
    pending = t2.filter_pending(_df(spark, 0, 100))
    got = {r["bucket"] for r in pending.select("bucket").distinct().collect()}
    assert got == {2, 3}


def test_rollback_cdc_contract(spark, tmp_path):
    """Consumers at-or-below the target stay consistent (truncated
    snapshots emit no events); a consumer checkpointed INSIDE the
    truncated range gets the documented KeyError -> full re-sync; and
    genesis changelog replay still reproduces read()."""
    t = IceliteTable(str(tmp_path / "tbl"))
    good = t.commit_append(_df(spark, 0, 50))

    # consumer X consumes through the good snapshot
    ch, ack = t.consume_changes(spark, "x")
    assert ch.count() == 50
    ack()

    bad = t.commit_append(_df(spark, 50, 80, prefix="poisoned-"))
    # consumer Y consumes through the BAD snapshot (inside the range
    # the rollback will truncate)
    ch, ack = t.consume_changes(spark, "y")
    assert ch.count() == 80  # genesis window: both snapshots
    ack()

    rb = t.rollback(good["snapshot_id"])

    # X polls after the rollback: window (good, rb] carries no events
    ch, ack = t.consume_changes(spark, "x")
    assert ch is not None and ch.count() == 0
    ack()

    # Y's checkpoint was truncated: documented KeyError -> re-sync
    with pytest.raises(KeyError):
        t.consume_changes(spark, "y")

    # genesis replay == read() on the post-rollback chain
    changes = t.read_changes(spark)
    assert (
        changes.filter(F.col("_change_type") == "insert").count()
        - changes.filter(F.col("_change_type") == "delete").count()
        == t.read(spark).count()
    )
    assert rb["rollback_to_id"] == good["snapshot_id"]


def test_rollback_compact_folds_and_vacuum_reclaims(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "tbl"))
    t.commit_append(_df(spark, 0, 40))
    tip = t.current_snapshot()
    bad = t.commit_append(_df(spark, 40, 60, prefix="poisoned-"))
    bad_dir = os.path.basename(os.path.normpath(bad["data_dir"]))
    t.rollback(tip["snapshot_id"])

    folded = t.compact(spark)
    assert folded is not None
    assert _ids(t.read(spark)) == list(range(40))
    # the truncated manifest file is cleaned up with the superseded
    # history (not just the live list the compact folded)
    on_disk = [
        n for n in os.listdir(t.manifest_dir)
        if n.startswith("snap-") and n.endswith(".json")
    ]
    assert on_disk == [f"snap-{folded['sequence']:06d}.json"]
    # ...and the poisoned data dir is now an orphan vacuum reclaims
    report = t.vacuum(grace_sec=0)
    assert bad_dir in report["removed"]
    assert _ids(t.read(spark)) == list(range(40))


def test_rollback_tag_interplay(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "tbl"))
    good = t.commit_append(_df(spark, 0, 30))
    t.commit_append(_df(spark, 30, 50))
    t.tag("pre-rollback")  # cut at the tip that includes the bad rows
    t.rollback(good["snapshot_id"])
    t.commit_append(_df(spark, 50, 60))
    t.tag("post-rollback")

    # a tag cut BEFORE the rollback keeps its exact bytes (its chain
    # has no rollback manifest)
    assert t.read(spark, tag="pre-rollback").count() == 50
    # a tag cut after embeds the rollback: 30 restored + 10 new
    assert _ids(t.read(spark, tag="post-rollback")) == (
        list(range(30)) + list(range(50, 60))
    )
    assert _ids(t.read(spark)) == list(range(30)) + list(range(50, 60))


def test_rollback_branch_interplay(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "tbl"))
    fork = t.commit_append(_df(spark, 0, 20))
    t.create_branch("stage")
    br = t.branch("stage")
    br.commit_append(_df(spark, 20, 30))

    with pytest.raises(NotImplementedError):
        br.rollback(fork["snapshot_id"])

    # a rollback on main above the fork is a history change: publish
    # must conflict (fast-forward only)
    extra = t.commit_append(_df(spark, 100, 110))
    t.rollback(fork["snapshot_id"])
    assert extra["snapshot_id"] not in {
        s["snapshot_id"] for s in t.snapshots()
    }
    with pytest.raises(RuntimeError, match="main advanced"):
        t.publish_branch("stage")
    # the branch's own merged view is unaffected by main's rollback
    # ABOVE the fork (its base is pinned at the fork point)
    assert br.read(spark).count() == 30
    t.delete_branch("stage")


def test_nested_rollbacks_checkpoint_branch_compact(spark, tmp_path):
    """Layered interplay: a rollback OF a rollback (ascending replay
    truncates both), metadata checkpoint with aggressive expiry over
    the truncated history, a branch forked while the tip IS a rollback
    manifest, and a final compact+vacuum — state stays exact at every
    step."""
    t = IceliteTable(str(tmp_path / "tbl"))
    a = t.commit_append(_df(spark, 0, 10))
    t.commit_append(_df(spark, 10, 20))
    b_tip = t.current_snapshot()
    t.commit_append(_df(spark, 20, 30))
    t.rollback(b_tip["snapshot_id"])      # kills 20..30
    t.rollback(a["snapshot_id"])          # kills 10..20 AND rollback #1
    assert _ids(t.read(spark)) == list(range(10))

    # checkpoint + expire over the truncated history: the folded live
    # list (a + rollback#2) stays authoritative through raw-file loss
    t.checkpoint(expire_manifests=True, retain_last=1)
    assert _ids(t.read(spark)) == list(range(10))

    d = t.commit_append(_df(spark, 30, 40))
    assert _ids(t.read(spark)) == list(range(10)) + list(range(30, 40))
    assert d["parent_id"] == t.snapshots()[-2]["snapshot_id"]

    # fork a branch while history contains rollbacks; stage + publish
    t.create_branch("stage")
    br = t.branch("stage")
    br.commit_append(_df(spark, 40, 50))
    assert _ids(br.read(spark)) == (
        list(range(10)) + list(range(30, 50))
    )
    assert _ids(t.read(spark)) == list(range(10)) + list(range(30, 40))
    t.publish_branch("stage")
    assert _ids(t.read(spark)) == list(range(10)) + list(range(30, 50))

    # fold everything; vacuum reclaims the truncated batches' dirs
    t.compact(spark)
    t.vacuum(grace_sec=0)
    assert _ids(t.read(spark)) == list(range(10)) + list(range(30, 50))
    live = {os.path.basename(s["data_dir"]) for s in t.snapshots()}
    assert set(os.listdir(os.path.join(t.path, "data"))) == live
