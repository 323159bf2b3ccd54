"""Metadata tables (Iceberg ``history``/``files``/``partitions``):
operational introspection as queryable DataFrames + the metadata-only
CLI commands, all computed from manifests — no data file is opened."""

import json

from pyspark.sql import functions as F

from mini_html_parser_spark.plans.icelite import IceliteTable


def _df(spark, lo, hi, n_buckets=4):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        F.pmod(F.col("id"), F.lit(n_buckets)).cast("int").alias("bucket"),
    )


def test_history_files_partitions_tables(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "tbl"))
    a = t.commit_append(_df(spark, 0, 100))          # seq 0: append
    t.commit_delete(                                  # seq 1: delete
        _df(spark, 0, 100).filter(F.col("doc_id") < 10).select("doc_id")
    )
    t.merge(_df(spark, 0, 20), key_col="doc_id")      # seq 2: merge
    bad = t.commit_append(_df(spark, 100, 120))       # seq 3: append
    t.rollback(bad["parent_id"])                      # seq 4: rollback

    hist = t.history_df(spark).orderBy("sequence").collect()
    assert [r["kind"] for r in hist] == [
        "append", "delete", "merge", "rollback"
    ]
    assert [r["sequence"] for r in hist] == [0, 1, 2, 4]  # seq 3 truncated
    assert hist[0]["total_rows"] == 100
    assert hist[1]["delete_count"] == 10
    assert hist[2]["kind"] == "merge" and hist[2]["total_rows"] == 20
    # parent lineage is intact within the frame
    assert hist[1]["parent_id"] == hist[0]["snapshot_id"]
    assert hist[0]["snapshot_id"] == a["snapshot_id"]

    files = t.files_df(spark)
    # one file per (live data snapshot, non-empty bucket): append=4,
    # merge=4 (compact commit collapses to one file per bucket);
    # the delete snapshot carries no data files, seq-3 is truncated
    got = {(r["sequence"], r["bucket"]) for r in files.collect()}
    assert got == {(s, b) for s in (0, 2) for b in range(4)}
    assert files.count() == 8

    parts = t.partitions_df(spark).orderBy("bucket").collect()
    assert [r["bucket"] for r in parts] == [0, 1, 2, 3]
    # rows AS WRITTEN (additive lineage counters, deletes not netted):
    # 25/bucket from the append + 5/bucket from the merge
    assert all(r["rows"] == 30 for r in parts)
    assert all(r["n_files"] == 2 for r in parts)
    assert all(r["n_snapshots"] == 2 for r in parts)

    # the tables stay consistent through a compact (history folds to
    # one compaction snapshot; net rows survive)
    t.compact(spark)
    hist2 = t.history_df(spark).collect()
    assert len(hist2) == 1 and hist2[0]["kind"] == "compaction"
    # net state: merge re-owns keys 0-19, the delete retracted 0-9
    # from the original append only -> 20 + 80 = 100 rows survive
    assert hist2[0]["total_rows"] == t.read(spark).count() == 100
    assert t.partitions_df(spark).agg(F.sum("rows")).first()[0] == 100


def test_metadata_cli_rollback_partitions_files(spark, tmp_path, capsys):
    from jobs.table_tool import main

    t = IceliteTable(str(tmp_path / "tbl"))
    good = t.commit_append(_df(spark, 0, 40))
    t.commit_append(_df(spark, 40, 60))

    assert main([t.path, "rollback", "--snapshot", good["snapshot_id"]]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["rollback_to_id"] == good["snapshot_id"]
    assert t.read(spark).count() == 40

    assert main([t.path, "partitions"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert [p["bucket"] for p in rep["partitions"]] == [0, 1, 2, 3]
    assert sum(p["rows"] for p in rep["partitions"]) == 40

    assert main([t.path, "files"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["n_files"] == 4
    assert all(f["sequence"] == 0 for f in rep["files"])


def test_register_views_sql_surface(spark, tmp_path):
    """register_views: the table + its metadata tables as spark.sql
    temp views; the data view resolves deletes/rollbacks/rewrites at
    registration and re-registering picks up new commits."""
    t = IceliteTable(str(tmp_path / "tbl"))
    t.commit_append(_df(spark, 0, 40))
    t.commit_delete(
        _df(spark, 0, 40).filter(F.col("doc_id") < 4).select("doc_id")
    )
    names = t.register_views(spark, "corpus_v")
    assert names == [
        "corpus_v", "corpus_v_files", "corpus_v_history",
        "corpus_v_partitions",
    ]
    assert spark.sql("SELECT COUNT(*) c FROM corpus_v").first()["c"] == 36
    kinds = [
        r["kind"]
        for r in spark.sql(
            "SELECT kind FROM corpus_v_history ORDER BY sequence"
        ).collect()
    ]
    assert kinds == ["append", "delete"]
    assert spark.sql(
        "SELECT SUM(n_files) f FROM corpus_v_partitions"
    ).first()["f"] == 4

    # views pin the snapshot list at registration; re-register to see
    # a new commit
    t.commit_append(_df(spark, 40, 50))
    assert spark.sql("SELECT COUNT(*) c FROM corpus_v").first()["c"] == 36
    t.register_views(spark, "corpus_v")
    assert spark.sql("SELECT COUNT(*) c FROM corpus_v").first()["c"] == 46
