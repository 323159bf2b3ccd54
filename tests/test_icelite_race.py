"""Real MULTI-PROCESS commit races (round 6, VERDICT r5 #3).

The r5 concurrency tests exercised the os.link arbitration from
threads of one process; these spawn genuinely separate writer
processes (Spark-free manifest commits — the protocol under test is
pure filesystem) plus a concurrent compactor, and assert the
invariants the protocol promises:

- every committed manifest survives (directly or folded into a
  compacted manifest that conserves its counters),
- active sequences are contiguous (no gaps, no duplicates),
- every manifest on disk parses (readers can never observe a partial
  file — the tmp-write + atomic os.link publish),
- a compaction never supersedes history it did not fold
  (require_parent abort).
"""

import json
import multiprocessing as mp
import os
import uuid

from mini_html_parser_spark.plans.icelite import IceliteTable

N_WRITERS = 6
COMMITS_PER_WRITER = 8


def _writer(path: str, writer_id: int, out_q) -> None:
    t = IceliteTable(path)
    done = 0
    for i in range(COMMITS_PER_WRITER):
        manifest = {
            "sequence": 0,  # _commit_manifest re-seats it behind the tip
            "snapshot_id": f"w{writer_id}-{i}-{uuid.uuid4().hex[:8]}",
            "data_files": [f"data/fake-w{writer_id}-{i}.parquet"],
            "bucket_rows": {"0": 1},
            "total_rows": 1,
            "metrics": {"docs_parsed": 1},
        }
        # snapshots() can raise when a concurrent compactor is mid-
        # removal faster than the retry budget; the documented caller
        # contract is "retry the read", so the writer retries the
        # whole commit
        for _ in range(50):
            try:
                got = t._commit_manifest(manifest)
                assert got is not None
                done += 1
                break
            except RuntimeError:
                continue
        else:
            break
    out_q.put((writer_id, done))


def _compactor(path: str, rounds: int, out_q) -> None:
    """Spark-free manifest-level compactor: folds the active history
    into one compacted manifest conserving the docs_parsed counter,
    using the exact require_parent protocol compact() uses."""
    t = IceliteTable(path)
    folded = 0
    for _ in range(rounds):
        try:
            snaps = t.snapshots()
        except RuntimeError:
            continue
        if len(snaps) <= 1:
            continue
        parent = snaps[-1]
        total = sum(s["metrics"].get("docs_parsed", 0) for s in snaps)
        files = [f for s in snaps for f in s.get("data_files") or []]
        manifest = {
            "sequence": parent["sequence"] + 1,
            "snapshot_id": f"compact-{uuid.uuid4().hex[:8]}",
            "parent_id": parent["snapshot_id"],
            "data_files": files,
            "bucket_rows": {"0": total},
            "total_rows": total,
            "metrics": {"docs_parsed": total},
            "compacted": True,
        }
        if t._commit_manifest(manifest, require_parent=True) is None:
            continue  # history advanced underneath — correct abort
        for s in snaps:
            old = os.path.join(t.manifest_dir, f"snap-{s['sequence']:06d}.json")
            if os.path.exists(old):
                os.remove(old)
        folded += 1
    out_q.put(("compactor", folded))


def test_multiprocess_commit_race_with_concurrent_compaction(tmp_path):
    path = str(tmp_path / "race")
    t = IceliteTable(path)
    # seed one snapshot so the compactor has something to fold early
    t._commit_manifest(
        {
            "sequence": 0,
            "snapshot_id": "seed",
            "data_files": ["data/seed.parquet"],
            "bucket_rows": {"0": 1},
            "total_rows": 1,
            "metrics": {"docs_parsed": 1},
        }
    )

    # spawn, not fork: the pytest process carries a live JVM + py4j
    # threads, and forking a threaded process can deadlock children on
    # inherited locks.  Spawned children import only the icelite module
    # (no Spark session is created — the protocol is pure filesystem).
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_writer, args=(path, w, q))
        for w in range(N_WRITERS)
    ] + [ctx.Process(target=_compactor, args=(path, 40, q))]
    for p in procs:
        p.start()
    results = {}
    for _ in procs:
        who, n = q.get(timeout=120)
        results[who] = n
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0

    committed = sum(v for k, v in results.items() if k != "compactor")
    assert committed == N_WRITERS * COMMITS_PER_WRITER, results

    # --- invariants on the final on-disk state ---
    # 1. every manifest file parses completely (atomic publish)
    for name in os.listdir(t.manifest_dir):
        if name.startswith("snap-") and name.endswith(".json"):
            with open(os.path.join(t.manifest_dir, name)) as f:
                json.load(f)
    # tmp files never linger
    assert not [n for n in os.listdir(t.manifest_dir) if n.endswith(".tmp")]

    snaps = t.snapshots()
    # 2. active sequences contiguous, strictly increasing, unique
    seqs = [s["sequence"] for s in snaps]
    assert seqs == list(range(seqs[0], seqs[0] + len(seqs)))
    assert len({s["snapshot_id"] for s in snaps}) == len(snaps)

    # 3. row conservation: folded counters + unfolded commits account
    # for every committed row exactly once
    total = sum(s["metrics"].get("docs_parsed", 0) for s in snaps)
    assert total == committed + 1  # +1 seed

    # 4. parent chain of the ACTIVE history is well-formed: each
    # non-floor manifest's parent exists at the preceding sequence
    by_seq = {s["sequence"]: s for s in snaps}
    for s in snaps:
        prev = by_seq.get(s["sequence"] - 1)
        if prev is not None:
            assert s.get("parent_id") == prev["snapshot_id"], (
                s["sequence"],
                s.get("parent_id"),
            )


def test_multiprocess_writers_alone_are_gapless(tmp_path):
    """No compactor: N processes × K commits must land on exactly
    sequences 0..N*K-1 with all manifests intact."""
    path = str(tmp_path / "race2")
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_writer, args=(path, w, q)) for w in range(N_WRITERS)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0

    t = IceliteTable(path)
    snaps = t.snapshots()
    assert len(snaps) == N_WRITERS * COMMITS_PER_WRITER
    assert [s["sequence"] for s in snaps] == list(range(len(snaps)))
    assert len({s["snapshot_id"] for s in snaps}) == len(snaps)
    # every writer's every commit is present
    ids = {s["snapshot_id"].rsplit("-", 1)[0] for s in snaps}
    assert ids == {
        f"w{w}-{i}" for w in range(N_WRITERS) for i in range(COMMITS_PER_WRITER)
    }


def _checkpointer(path: str, rounds: int, expire: bool, out_q) -> None:
    """Spark-free metadata checkpointer racing the writers: folds the
    active manifest list into a ckpt file; with ``expire`` it also
    removes the folded per-commit manifests (log cleanup) — the
    hostile mode, since readers and writers must then find history
    through the checkpoint alone.  Time-bounded rather than
    round-bounded: a fixed round count can burn out before the first
    writer even commits (liveness flake), while the race under test
    needs the checkpointer ALIVE throughout the writers' window."""
    import time

    t = IceliteTable(path)
    done = 0
    deadline = time.monotonic() + 8.0
    spins = 0
    while time.monotonic() < deadline and spins < rounds * 50:
        spins += 1
        try:
            rep = t.checkpoint(expire_manifests=expire)
        except RuntimeError:
            continue  # mid-removal scan contention: documented retry
        if rep is not None:
            done += 1
        if done >= rounds:
            break
        time.sleep(0.002)  # every round: an empty table must not spin out
    out_q.put(("checkpointer", done))


def test_multiprocess_commit_race_with_concurrent_checkpointer(tmp_path):
    """N writer processes × K commits racing a checkpointer in expire
    mode: every commit survives (visible through ckpt+tail), sequences
    stay gapless/unique, counters conserve, and no partial metadata
    file is ever observable."""
    path = str(tmp_path / "race3")
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_writer, args=(path, w, q))
        for w in range(N_WRITERS)
    ] + [ctx.Process(target=_checkpointer, args=(path, 60, True, q))]
    for p in procs:
        p.start()
    results = {}
    for _ in procs:
        who, n = q.get(timeout=120)
        results[who] = n
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0

    committed = sum(v for k, v in results.items() if k != "checkpointer")
    assert committed == N_WRITERS * COMMITS_PER_WRITER, results

    t = IceliteTable(path)
    # every surviving metadata file parses completely (atomic publish)
    for name in os.listdir(t.manifest_dir):
        if name.endswith(".json"):
            with open(os.path.join(t.manifest_dir, name)) as f:
                json.load(f)
    assert not [n for n in os.listdir(t.manifest_dir) if n.endswith(".tmp")]

    snaps = t.snapshots()
    assert len(snaps) == committed
    seqs = [s["sequence"] for s in snaps]
    assert seqs == list(range(committed))
    assert len({s["snapshot_id"] for s in snaps}) == committed
    total = sum(s["metrics"].get("docs_parsed", 0) for s in snaps)
    assert total == committed
    # the checkpointer actually exercised the race
    assert results["checkpointer"] > 0
