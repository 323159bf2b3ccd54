"""Incrementally maintained derived tables (materialized views) over
the icelite CDC changelog.

A 100-TB corpus table feeds derived artifacts — the BM25 postings
index (operators/retrieval.py), feature tables, per-doc fingerprints —
that must track the source through appends, upserts (re-crawls) and
row-level deletes (takedowns) WITHOUT rebuilding.  This module wires
three existing primitives into that loop:

* ``IceliteTable.consume_changes`` — the at-least-once changelog
  window with ack-after-process (plans/icelite.py);
* ``IceliteTable.merge`` / ``commit_delete`` — atomic row-delta
  commits on the derived table;
* the ``stream_batch_id`` replay-skip rule — commit identities that
  survive the derived table's own compaction (compact folds them into
  ``stream_batch_ids``; the streaming sink's exactly-once mechanism,
  streaming/extract_stream.py).

Exactly-once: each source snapshot applies to the derived table as at
most two commits with identities ``mv:<snapshot_id>:del`` and
``mv:<snapshot_id>:ins``; a crash anywhere (including between the
two) leaves the consumer un-acked, the window replays, and
already-applied identities are skipped — per-commit idempotence turns
the at-least-once window into an exactly-once view.

Ordering: snapshots apply in SOURCE SEQUENCE order, deletes before
inserts within a snapshot.  Because icelite equality deletes apply
only to strictly-lower sequences, a source delete-then-reinsert
replays correctly — but only under in-order application, which is why
the loop is per-snapshot rather than one batched job over the window
(a maintenance cycle typically covers a handful of commits; the
per-commit cost is the transform over THAT batch, never the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .icelite import IceliteTable


def applied_ids(derived: IceliteTable) -> set:
    """Commit identities already applied to ``derived`` — delegates to
    the table's single replay-skip fold (compaction-safe; shared with
    the streaming sink)."""
    return derived.committed_stream_ids()


def maintain_derived(
    spark,
    source: IceliteTable,
    derived: IceliteTable,
    transform,
    key_col: str = "doc_id",
    consumer_id: str = "matview",
) -> dict:
    """Run ONE maintenance cycle: fold every source change committed
    since the consumer's checkpoint into ``derived``.

    ``transform(batch_df) -> DataFrame`` must be row-local (each
    output row derives from exactly one input row — doc_terms,
    fingerprints, feature extraction ...), deterministic, must carry
    ``key_col`` through, and must emit the derived table's partition
    column (default ``bucket``).  Row-locality is what makes CDC
    maintenance exact: an insert event re-runs the transform on that
    row alone, a delete retracts by key — no cross-row state to patch.

    Returns ``{"snapshots_applied": n, "at_tip": bool}``.
    """
    changes, ack = source.consume_changes(spark, consumer_id)
    if changes is None:
        return {"snapshots_applied": 0, "at_tip": True}
    # the loop below slices the window once per snapshot — materialize
    # the changelog plan once (GC-managed blocks, the neardup/bloom
    # precedent) instead of re-executing the full read_changes union
    # per iteration
    changes = changes.localCheckpoint(eager=True)
    seen = applied_ids(derived)
    meta_cols = ["_change_type", "_commit_sequence", "_commit_snapshot_id"]
    # window snapshots + their event-kind presence in ONE driver-side
    # metadata aggregate, so insert-only snapshots (the commit-heavy
    # ingest common case) never launch an empty delete-commit job
    snaps = (
        changes.groupBy(meta_cols[1], meta_cols[2])
        .agg(
            F.sum((F.col(meta_cols[0]) == "delete").cast("int")).alias("nd"),
            F.sum((F.col(meta_cols[0]) == "insert").cast("int")).alias("ni"),
        )
        .collect()
    )
    applied = 0
    for row in sorted(snaps, key=lambda r: r[meta_cols[1]]):
        sid, has_del, has_ins = (
            row[meta_cols[2]], row["nd"] > 0, row["ni"] > 0,
        )
        ev = changes.filter(F.col("_commit_snapshot_id") == sid)
        del_id, ins_id = f"mv:{sid}:del", f"mv:{sid}:ins"
        # skip conditions: already applied (replay), nothing to do
        # (insert-only / delete-only snapshot — the skipped commit is
        # empty by construction, so never recording its identity is
        # harmless on replay), or an empty derived table (nothing to
        # retract; commit_delete on a snapshot-less table is a loud
        # error)
        if (
            del_id not in seen
            and has_del
            and derived.current_snapshot() is not None
        ):
            ins_keys = (
                ev.filter(F.col("_change_type") == "insert")
                .select(key_col)
                .distinct()
            )
            # pure retractions only: keys also re-inserted in this
            # snapshot are retracted by the merge commit itself (one
            # atomic manifest)
            pure_del = (
                ev.filter(F.col("_change_type") == "delete")
                .select(key_col)
                .distinct()
                .join(ins_keys, key_col, "left_anti")
            )
            if derived.commit_delete(
                pure_del, key_col=key_col,
                metrics={"stream_batch_id": del_id},
            ) is not None:
                seen.add(del_id)
        if ins_id not in seen and has_ins:
            ins = ev.filter(F.col("_change_type") == "insert").drop(
                *meta_cols
            )
            if derived.merge(
                transform(ins), key_col=key_col,
                metrics={"stream_batch_id": ins_id},
            ) is not None:
                seen.add(ins_id)
        applied += 1
    ack()
    return {"snapshots_applied": applied, "at_tip": False}


def postings_transform(n_buckets: int = 8, text_col: str = "text",
                       id_col: str = "doc_id"):
    """Row-local transform for a BM25 postings materialized view:
    doc_terms over the batch plus the derived table's partition
    column.  Buckets hash the doc id so a doc's postings land in one
    bucket — retraction by id touches one bucket's files (and the
    min/max file stats keep term-pruned scans selective within it)."""
    from ..operators.retrieval import doc_terms

    def transform(batch: DataFrame) -> DataFrame:
        return doc_terms(batch, text_col=text_col, id_col=id_col).withColumn(
            "bucket", F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int")
        )

    return transform
