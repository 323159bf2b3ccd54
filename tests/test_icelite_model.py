"""Model-based icelite test (round 6): a seeded random interleaving of
table operations is checked after EVERY step against a plain Python
dict model — the kind of interaction bug (delete × merge × compact ×
tag × re-append ordering) that example-based tests miss.

Model: {doc_id: text} plus a mirror of the LIVE snapshot chain
(``hist``: snapshot_id → model state at that commit) for rollback
targeting and time-travel checks.  Invariants verified at each step:

- read() == model state;
- a tag cut earlier still reads the model state AT THE TAG, through
  any later compaction (pin contract) AND any later rollback (a tag
  cut before a rollback has no rollback manifest in its chain);
- replaying read_changes() from genesis reproduces read() exactly
  (after a compact the genesis window starts at the bootstrap
  manifest, which IS the net history; rollback-truncated snapshots
  emit no events — same replay check applies);
- time travel to a random live snapshot reproduces the model state
  as of that commit.
"""

import random

import pytest
from pyspark.sql import functions as F

from mini_html_parser_spark.plans.icelite import IceliteTable

N_STEPS = 28
SEED = 20260818


def _frame(spark, ids_texts):
    return spark.createDataFrame(
        [(int(i), t, int(i) % 4) for i, t in ids_texts],
        "doc_id bigint, text string, bucket int",
    )


def _keys_frame(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "doc_id bigint")


def _state(df):
    return {r["doc_id"]: r["text"] for r in df.collect()}


def _replay(changes):
    state = {}
    by_seq: dict[int, dict] = {}
    for r in changes:
        by_seq.setdefault(r["_commit_sequence"], {"d": [], "i": []})
        by_seq[r["_commit_sequence"]][
            "d" if r["_change_type"] == "delete" else "i"
        ].append(r)
    for seq in sorted(by_seq):
        for r in by_seq[seq]["d"]:
            state.pop(r["doc_id"], None)
        for r in by_seq[seq]["i"]:
            state[r["doc_id"]] = r["text"]
    return state


def test_random_op_interleaving_matches_model(spark, tmp_path):
    rng = random.Random(SEED)
    t = IceliteTable(str(tmp_path / "t"))
    model: dict[int, str] = {}
    next_id = 0
    gen = 0
    tags: dict[str, dict[int, str]] = {}
    hist: list[tuple[str, dict[int, str]]] = []  # live chain mirror

    # seed commit so every op has something to act on
    batch = [(i, f"g0-{i}") for i in range(8)]
    seed_man = t.commit_append(_frame(spark, batch))
    model.update(batch)
    next_id = 8
    hist.append((seed_man["snapshot_id"], dict(model)))

    for step in range(N_STEPS):
        op = rng.choice(
            ["append", "append", "delete", "merge", "compact", "tag",
             "reappend", "rollback", "rewrite"]
        )
        gen += 1
        if op == "append":
            batch = [(next_id + k, f"g{gen}-{next_id + k}") for k in range(5)]
            next_id += 5
            man = t.commit_append(_frame(spark, batch))
            model.update(batch)
            hist.append((man["snapshot_id"], dict(model)))
        elif op == "reappend":
            # re-ingest of existing ids WITHOUT retraction: duplicates
            # by design (append-only) — model as latest-wins is wrong,
            # so re-append only ids that are currently DELETED
            dead = [i for i in range(next_id) if i not in model]
            pick = rng.sample(dead, min(3, len(dead)))
            if not pick:
                continue
            batch = [(i, f"g{gen}-{i}") for i in pick]
            man = t.commit_append(_frame(spark, batch))
            model.update(batch)
            hist.append((man["snapshot_id"], dict(model)))
        elif op == "delete":
            live = sorted(model)
            pick = rng.sample(live, min(rng.randint(1, 4), len(live)))
            man = t.commit_delete(_keys_frame(spark, pick))
            if man is not None:
                for i in pick:
                    model.pop(i, None)
                hist.append((man["snapshot_id"], dict(model)))
        elif op == "merge":
            live = sorted(model)
            upd = rng.sample(live, min(2, len(live)))
            new = [next_id]
            next_id += 1
            batch = [(i, f"g{gen}-{i}") for i in upd + new]
            man = t.merge(_frame(spark, batch))
            model.update(batch)
            hist.append((man["snapshot_id"], dict(model)))
        elif op == "compact":
            man = t.compact(spark)
            if man is not None:  # history folded to one snapshot
                hist = [(man["snapshot_id"], dict(model))]
        elif op == "rewrite":
            # partial compaction: physically folds 1-2 random buckets,
            # logically a NO-OP — model unchanged; the manifest is a
            # legal time-travel/rollback target at the same state
            pick = set(rng.sample(range(4), rng.randint(1, 2)))
            man = t.rewrite(spark, buckets=pick)
            if man is not None:
                hist.append((man["snapshot_id"], dict(model)))
        elif op == "rollback":
            if len(hist) < 2:
                continue
            idx = rng.randrange(len(hist) - 1)  # any non-tip live snap
            sid, st = hist[idx]
            rb = t.rollback(sid)
            model = dict(st)
            hist = hist[: idx + 1] + [(rb["snapshot_id"], dict(model))]
        elif op == "tag":
            name = f"t{step}"
            t.tag(name)
            tags[name] = dict(model)

        # ---- invariants after every step ----
        assert _state(t.read(spark)) == model, (step, op)
        ch = _replay(t.read_changes(spark).collect())
        assert ch == model, (step, op, "changelog replay")
        # spot-check one random still-live tag (full sweep is slow)
        if tags and rng.random() < 0.5:
            name = rng.choice(sorted(tags))
            assert _state(t.read(spark, tag=name)) == tags[name], (
                step, op, name,
            )
        # time travel to a random LIVE snapshot == model state then
        if rng.random() < 0.4:
            sid, st = hist[rng.randrange(len(hist))]
            assert _state(t.read(spark, as_of_snapshot=sid)) == st, (
                step, op, "time travel",
            )

    # final: every tag still reproduces its pinned state
    for name, want in tags.items():
        assert _state(t.read(spark, tag=name)) == want, name
    # and the metadata stays navigable after a checkpoint
    t.checkpoint(expire_manifests=True)
    assert _state(t.read(spark)) == model
    for name, want in tags.items():
        assert _state(t.read(spark, tag=name)) == want, name
