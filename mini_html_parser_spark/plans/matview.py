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
    """Commit identities already applied to ``derived`` — a metadata
    fold (manifest metrics only, no data read); compaction-safe via
    the stream_batch_ids folding rule."""
    seen: set = set()
    for s in derived.snapshots():
        m = s.get("metrics") or {}
        if "stream_batch_id" in m:
            seen.add(m["stream_batch_id"])
        seen.update(m.get("stream_batch_ids") or [])
    return seen


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
    seen = applied_ids(derived)
    meta_cols = ["_change_type", "_commit_sequence", "_commit_snapshot_id"]
    # snapshot ids of the window, in sequence order (driver-side: one
    # tiny distinct over the window's METADATA columns)
    snaps = [
        (r["_commit_sequence"], r["_commit_snapshot_id"])
        for r in changes.select(meta_cols[1], meta_cols[2])
        .distinct()
        .collect()
    ]
    applied = 0
    for _seq, sid in sorted(snaps):
        ev = changes.filter(F.col("_commit_snapshot_id") == sid)
        ins = ev.filter(F.col("_change_type") == "insert").drop(*meta_cols)
        dels = ev.filter(F.col("_change_type") == "delete").drop(*meta_cols)
        ins_keys = ins.select(key_col).distinct()
        # pure retractions only: keys also re-inserted in this snapshot
        # are retracted by the merge commit itself (one atomic manifest)
        pure_del = dels.select(key_col).distinct().join(
            ins_keys, key_col, "left_anti"
        )
        del_id, ins_id = f"mv:{sid}:del", f"mv:{sid}:ins"
        # an empty derived table has nothing to retract (and
        # commit_delete on a snapshot-less table is a loud error)
        if del_id not in seen and derived.current_snapshot() is not None:
            snap = derived.commit_delete(
                pure_del, key_col=key_col,
                metrics={"stream_batch_id": del_id},
            )
            # commit_delete returns None on empty keys: record the
            # identity anyway via the next insert commit's skip being
            # harmless (an empty delete replayed is still empty)
            if snap is not None:
                seen.add(del_id)
        if ins_id not in seen:
            snap = derived.merge(
                transform(ins), key_col=key_col,
                metrics={"stream_batch_id": ins_id},
            )
            if snap is not None:
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
