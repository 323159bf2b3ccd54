"""icelite — a minimal Iceberg-style snapshot/manifest table layer.

The sandbox has no Iceberg runtime jar, so snapshot semantics
(reference B8's resume + north_rule's per-partition lineage) are
provided by parquet data files + JSON manifests with an interface
shaped so a real Iceberg catalog drops in on a cluster
(``spark.jars.packages org.apache.iceberg:...`` + ``MERGE``/append).

Layout::

    <table>/data/snap-<n>-<uuid8>/bucket=<k>/*.parquet  (one dir per
                                    commit ATTEMPT; uuid-suffixed so
                                    concurrent writers never share)
    <table>/_icelite/snap-<n>.json    (manifest — THE commit point,
                                    published by atomic os.link; the
                                    <n> in the dir name is advisory,
                                    the manifest's sequence is truth)
    <table>/_icelite/schema-<k>.json  (schema versions, id-based
                                    column mapping; never removed)

A manifest records: snapshot id, parent id, data dir + file list,
committed buckets, per-bucket row counts (lineage), schema id, and
job-level metrics.  Readers scan the manifests' file lists; a
crashed or lost-race write never commits (its dir stays
unreferenced).  Resume = anti-join of input buckets against the
committed bucket set — no per-row bookkeeping.  Concurrent commits
are arbitrated optimistically per sequence (_commit_manifest).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, functions as F


class IceliteTable:
    def __init__(self, path: str):
        self.path = path
        self.manifest_dir = os.path.join(path, "_icelite")

    # ---- manifest plumbing -------------------------------------------------
    def snapshots(self) -> list[dict]:
        """Active manifests, in sequence order.

        A ``compacted`` manifest SUPERSEDES everything below its
        sequence: older manifests are invisible even if still on disk,
        so a crash between writing the compacted manifest and removing
        the superseded ones can never double-count rows (ADVICE r2,
        medium — the remove loop is cleanup, not a correctness step).
        """
        if not os.path.isdir(self.manifest_dir):
            return []
        # a concurrent compact() can remove superseded manifests
        # between our listdir and open.  Removal only starts AFTER the
        # compacted manifest is durable, so on a re-list the compacted
        # manifest is visible and the history is complete — retry the
        # scan rather than returning a partial (gap-sequenced) view.
        # A short backoff between attempts lets the remover finish its
        # loop; if the scan is STILL incomplete after the budget, raise
        # instead of returning a partial view that could silently miss
        # committed data (ADVICE r5, medium).
        import time as _time

        complete = False
        for attempt in range(5):
            if attempt:
                _time.sleep(0.05 * attempt)
            snaps = []
            complete = True
            for name in sorted(os.listdir(self.manifest_dir)):
                if name.startswith("snap-") and name.endswith(".json"):
                    try:
                        with open(os.path.join(self.manifest_dir, name)) as f:
                            snaps.append(json.load(f))
                    except FileNotFoundError:
                        complete = False
                        break
            if complete:
                break
        if not complete:
            raise RuntimeError(
                f"icelite table {self.path}: manifest scan still "
                "incomplete after 5 attempts (a concurrent compact() is "
                "removing superseded manifests faster than we can list); "
                "retry the read"
            )
        floor = max(
            (s["sequence"] for s in snaps if s.get("compacted")), default=None
        )
        if floor is not None:
            snaps = [s for s in snaps if s["sequence"] >= floor]
        return snaps

    def current_snapshot(self) -> dict | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def committed_buckets(self) -> set[int]:
        buckets: set[int] = set()
        for s in self.snapshots():
            buckets.update(int(b) for b in s["bucket_rows"].keys())
        return buckets

    # ---- schema evolution (VERDICT r4 #5) ----------------------------------
    #
    # Iceberg-style ID-BASED column mapping: every column gets a
    # stable field id at creation; renames keep the id, adds allocate
    # a fresh one.  Data files keep their write-time physical names,
    # and the read path maps physical names → current names BY ID, so
    # old snapshots remain readable after any number of renames, and
    # columns added later surface as typed nulls in pre-evolution
    # snapshots.  Schema versions live beside the manifests
    # (``_icelite/schema-<k>.json``, atomic write) and each snapshot
    # records the ``schema_id`` it was written under; compact() never
    # removes schema files.  Divergence from Iceberg, documented:
    # time travel presents the CURRENT schema (unified view), not the
    # as-of snapshot's schema — Iceberg's default is the latter with a
    # schema-id override.

    def schemas(self) -> list[dict]:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.startswith("schema-") and name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    out.append(json.load(f))
        return out

    def current_schema(self) -> dict | None:
        ss = self.schemas()
        return ss[-1] if ss else None

    def _write_schema(self, schema: dict) -> dict:
        """Publish a schema version with the same link arbitration as
        manifests (_commit_manifest): writer-unique tmp + atomic
        os.link, so exactly one writer wins ``schema-<k>`` and readers
        never see a partial file.  A LOSER gets the winner's content
        back — callers must compare/validate against the return value
        rather than assume their own schema was registered."""
        os.makedirs(self.manifest_dir, exist_ok=True)
        k = schema["schema_id"]
        target = os.path.join(self.manifest_dir, f"schema-{k:06d}.json")
        tmp = os.path.join(
            self.manifest_dir, f".schema-{k}-{uuid.uuid4().hex}.json.tmp"
        )
        with open(tmp, "w") as f:
            json.dump(schema, f, indent=2)
        try:
            os.link(tmp, target)
        except FileExistsError:
            os.remove(tmp)
            with open(target) as f:
                return json.load(f)
        os.remove(tmp)
        return schema

    def _validate_append_schema(
        self, df: DataFrame, schema: dict, partition_col: str
    ) -> None:
        """Refuse name OR type drift between ``df`` and the recorded
        table schema (silent drift across appends is how a long-lived
        table rots; a type change has no evolution path)."""
        want = {f["name"]: f["type"] for f in schema["fields"]}
        got = {
            f.name: f.dataType.simpleString()
            for f in df.schema.fields
            if f.name != partition_col
        }
        if set(got) != set(want):
            raise ValueError(
                f"icelite table {self.path}: append columns "
                f"{sorted(got)} != current table schema {sorted(want)}; "
                "call evolve(add_columns=..., rename_columns=...) first"
            )
        drift = {n: (got[n], want[n]) for n in got if got[n] != want[n]}
        if drift:
            raise ValueError(
                f"icelite table {self.path}: append column types differ "
                "from the table schema: "
                + ", ".join(
                    f"{n} is {g} but table has {w}"
                    for n, (g, w) in sorted(drift.items())
                )
                + "; cast the columns before appending"
            )

    def _schema_from_df(self, df: DataFrame, partition_col: str) -> dict:
        fields = [
            {"id": i + 1, "name": f.name, "type": f.dataType.simpleString()}
            for i, f in enumerate(df.schema.fields)
            if f.name != partition_col
        ]
        return {
            "schema_id": 0,
            "fields": fields,
            "last_field_id": len(fields),
        }

    def evolve(
        self,
        add_columns: dict[str, str] | None = None,
        rename_columns: dict[str, str] | None = None,
    ) -> dict:
        """Commit a new schema version: ``add_columns`` maps new name →
        Spark type string (old snapshots read them as typed nulls);
        ``rename_columns`` maps old name → new name (field id is
        preserved, so existing data files need no rewrite — the read
        path re-labels by id).  Metadata-only: no data is touched,
        exactly like Iceberg's ``ALTER TABLE``."""
        cur = self.current_schema()
        if cur is None:
            raise FileNotFoundError(
                f"icelite table {self.path} has no schema to evolve "
                "(commit at least one snapshot first)"
            )
        fields = [dict(f) for f in cur["fields"]]
        names = {f["name"] for f in fields}
        for old, new in (rename_columns or {}).items():
            if old not in names:
                raise KeyError(f"rename: no column {old!r} in current schema")
            if new in names:
                raise ValueError(f"rename: column {new!r} already exists")
            for f in fields:
                if f["name"] == old:
                    f["name"] = new
            names.discard(old)
            names.add(new)
        last_id = cur["last_field_id"]
        for name, typ in (add_columns or {}).items():
            if name in names:
                raise ValueError(f"add: column {name!r} already exists")
            last_id += 1
            fields.append({"id": last_id, "name": name, "type": typ})
            names.add(name)
        proposed = {
            "schema_id": cur["schema_id"] + 1,
            "fields": fields,
            "last_field_id": last_id,
        }
        published = self._write_schema(proposed)
        if published != proposed:
            # another writer evolved to the same schema_id first —
            # surface the conflict instead of silently adopting theirs
            raise RuntimeError(
                f"icelite table {self.path}: concurrent schema "
                f"evolution conflict at schema_id {proposed['schema_id']}; "
                "re-read current_schema() and retry"
            )
        return published

    def _read_with_schema(
        self, spark, snaps: list[dict], buckets: set[int] | None = None
    ) -> DataFrame | None:
        """One scan per DISTINCT schema version among ``snaps`` (not
        per snapshot — plan size stays O(schema versions), which is
        O(1) in practice since evolutions are rare), each projected to
        the current schema by field id, then unioned by name.  Returns
        None when the table predates schema tracking (caller falls
        back to the raw flat read)."""
        all_schemas = self.schemas()
        schemas = {s["schema_id"]: s for s in all_schemas}
        if not schemas:
            return None
        current = self.current_schema()
        # snapshots that PREDATE schema tracking were written with the
        # physical names of the OLDEST registered schema (v0 is always
        # derived from the same job's frame that also wrote them) —
        # defaulting to the CURRENT id would project post-evolution
        # names onto pre-evolution files and fail the read
        legacy_sid = all_schemas[0]["schema_id"]
        keep = {f"bucket={b}" for b in buckets} if buckets is not None else None
        by_schema: dict[int, list[str]] = {}
        for s in snaps:
            sid = s.get("schema_id", legacy_sid)
            files = self._snapshot_files(s)
            if keep is not None:
                files = [
                    f for f in files
                    if any(part in keep for part in f.split(os.sep))
                ]
            if files:
                by_schema.setdefault(sid, []).extend(files)
        if not by_schema:
            return None
        parts = []
        for sid, files in sorted(by_schema.items()):
            write_names = {
                f["id"]: f["name"] for f in schemas[sid]["fields"]
            }
            df = spark.read.parquet(*files)
            cols = []
            for f in current["fields"]:
                phys = write_names.get(f["id"])
                if phys is not None:
                    cols.append(F.col(phys).alias(f["name"]))
                else:
                    # column added after this snapshot was written
                    cols.append(F.lit(None).cast(f["type"]).alias(f["name"]))
            cols.append(
                F.regexp_extract(
                    F.input_file_name(), r"bucket=(\d+)", 1
                ).cast("int").alias("bucket")
            )
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def partitioning(self) -> dict | None:
        """The bucket-layout the table was first committed with.

        Resume correctness requires stable bucket ids: the salt is
        ``pmod(xxhash64(doc_id), n_buckets)``, so replaying with a
        different ``n_buckets`` (e.g. a different cluster size)
        would remap ids against the committed set — silently skipping
        or re-extracting documents.  The first snapshot records the
        layout; resumes must reuse it (run_extraction_job errors on
        mismatch)."""
        for s in self.snapshots():
            p = s.get("partitioning")
            if p:
                return p
        return None

    # ---- read / resume -----------------------------------------------------
    def _snapshot_files(self, snap: dict) -> list[str]:
        """Data files of one snapshot — from the manifest when recorded
        (Iceberg-style: no storage listing on the read path), else a
        one-time directory walk for pre-data_files manifests."""
        rel = snap.get("data_files")
        if rel is not None:
            return [os.path.join(self.path, p) for p in rel]
        files = []
        for root, _dirs, names in os.walk(snap["data_dir"]):
            files.extend(
                os.path.join(root, n) for n in names if n.endswith(".parquet")
            )
        return files

    def read(
        self,
        spark,
        buckets: set[int] | None = None,
        as_of_snapshot: str | None = None,
    ) -> DataFrame:
        """All committed rows as ONE scan.

        ``as_of_snapshot`` is Iceberg's ``VERSION AS OF`` time travel:
        only data files committed at or before that snapshot enter the
        scan.  A snapshot superseded by a later ``compact()`` is
        expired — time travel below the compaction floor raises (the
        same contract as Iceberg snapshot expiration).

        ``buckets`` prunes at the MANIFEST level: only files under the
        requested ``bucket=<k>`` dirs enter the scan's file index —
        stronger than scan-level PartitionFilters (the planner never
        even lists the other files; at 100 TB that's the difference
        between a metadata lookup and a storage listing).

        Early versions unioned one partition-discovering scan per
        snapshot — a plan that grows linearly with snapshot count and
        degrades at thousands of snapshots (long incremental jobs).
        Now the manifests provide the file list (like an Iceberg
        manifest list) and all files go into a single
        ``spark.read.parquet(*files)`` — flat read, no partition
        discovery — with the ``bucket`` lineage column rebuilt from the
        ``bucket=<k>`` path component (a zero-shuffle projection).
        Plan size is constant in the number of snapshots; see
        BENCH/PLANS.md for the measured 200-snapshot plan-build times.
        """
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"icelite table {self.path} has no snapshots")
        if as_of_snapshot is not None:
            target = [s for s in snaps if s["snapshot_id"] == as_of_snapshot]
            if not target:
                raise KeyError(
                    f"icelite table {self.path}: snapshot {as_of_snapshot!r} "
                    "not found among active snapshots (it never existed, or "
                    "was expired by a later compact())"
                )
            seq = target[0]["sequence"]
            snaps = [s for s in snaps if s["sequence"] <= seq]
        files = [f for s in snaps for f in self._snapshot_files(s)]
        if buckets is not None:
            keep = {f"bucket={b}" for b in buckets}
            files = [
                f for f in files
                if any(part in keep for part in f.split(os.sep))
            ]
            if not files:
                raise FileNotFoundError(
                    f"icelite table {self.path}: no data for buckets {sorted(buckets)}"
                )
        sdf = self._read_with_schema(spark, snaps, buckets)
        if sdf is not None:
            return sdf
        df = spark.read.parquet(*files)
        return df.withColumn(
            "bucket",
            F.regexp_extract(F.input_file_name(), r"bucket=(\d+)", 1).cast("int"),
        )

    def read_incremental(
        self, spark, after_snapshot: str, until_snapshot: str | None = None
    ) -> DataFrame:
        """Rows appended STRICTLY AFTER ``after_snapshot`` (optionally
        up to ``until_snapshot``) — Iceberg's incremental append scan,
        the consumption pattern of a daily-ingest downstream job
        (e.g. ``dedup_against`` the new rows only).  Append-only
        tables make this exact: every snapshot's files are disjoint.
        Raises KeyError when either endpoint was expired by
        ``compact()`` (history below the floor is gone)."""
        snaps = self.snapshots()
        by_id = {s["snapshot_id"]: s for s in snaps}
        if after_snapshot not in by_id:
            raise KeyError(
                f"icelite table {self.path}: snapshot {after_snapshot!r} "
                "not found among active snapshots (never existed or expired "
                "by compact())"
            )
        lo = by_id[after_snapshot]["sequence"]
        hi = None
        if until_snapshot is not None:
            if until_snapshot not in by_id:
                raise KeyError(
                    f"icelite table {self.path}: snapshot "
                    f"{until_snapshot!r} not found among active snapshots"
                )
            hi = by_id[until_snapshot]["sequence"]
        picked = [
            s for s in snaps
            if s["sequence"] > lo and (hi is None or s["sequence"] <= hi)
        ]
        files = [f for s in picked for f in self._snapshot_files(s)]
        if not files:
            return (
                self.read(spark).limit(0)  # empty frame, right schema
            )
        sdf = self._read_with_schema(spark, picked)
        if sdf is not None:
            return sdf
        df = spark.read.parquet(*files)
        return df.withColumn(
            "bucket",
            F.regexp_extract(F.input_file_name(), r"bucket=(\d+)", 1).cast("int"),
        )

    def filter_pending(self, df: DataFrame, bucket_col: str = "bucket") -> DataFrame:
        """Drop rows whose bucket is already committed (resume).

        The committed-bucket set is tiny metadata (manifest-level, like
        Iceberg partition summaries), so this is a partition-pruning
        filter, not a data-scale anti-join.
        """
        done = self.committed_buckets()
        if not done:
            return df
        return df.filter(~F.col(bucket_col).isin(sorted(done)))

    def _list_data_files(self, data_dir: str) -> list[str]:
        """Relative parquet paths under a freshly-written data dir —
        recorded in the manifest so reads never list storage."""
        files = []
        for root, _dirs, names in os.walk(data_dir):
            for n in names:
                if n.endswith(".parquet"):
                    files.append(
                        os.path.relpath(os.path.join(root, n), self.path)
                    )
        return sorted(files)

    # ---- commit protocol (optimistic concurrency) ----------------------------
    def _commit_manifest(
        self, manifest: dict, require_parent: bool = False
    ) -> dict | None:
        """Publish a manifest with Iceberg-style optimistic
        concurrency.  The manifest is written FULLY to a
        writer-unique tmp file, then ``os.link``ed to its
        sequence-numbered name — link is atomic and fails with
        FileExistsError if another writer already took the sequence,
        so exactly one writer wins each sequence and readers can never
        observe a partial manifest.  A loser re-reads the tip,
        re-parents, and retries at the next sequence (data dirs are
        uuid-suffixed, so concurrent writers never clobber each
        other's files either).

        ``require_parent=True`` (compaction): the manifest is only
        valid for the exact history it folded — if ANY snapshot
        committed after it was computed, publishing would supersede
        data it never read, so the commit aborts (returns None)
        instead of retrying.  On object stores without link semantics
        the swap belongs to a real catalog; this protocol is the
        single-filesystem seam for it (same as Iceberg's
        HadoopTableOperations vs catalog-based commits)."""
        os.makedirs(self.manifest_dir, exist_ok=True)
        expected_parent = manifest.get("parent_id")
        seq = manifest["sequence"]
        while True:
            tip = self.current_snapshot()
            tip_id = tip["snapshot_id"] if tip else None
            if require_parent and tip_id != expected_parent:
                return None  # history advanced under a compaction
            if not require_parent:
                manifest["parent_id"] = tip_id
                if tip is not None:
                    seq = max(seq, tip["sequence"] + 1)
            manifest["sequence"] = seq
            tmp = os.path.join(
                self.manifest_dir,
                f".snap-{seq}-{manifest['snapshot_id']}.json.tmp",
            )
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=2)
            target = os.path.join(self.manifest_dir, f"snap-{seq:06d}.json")
            try:
                os.link(tmp, target)
            except FileExistsError:
                os.remove(tmp)
                seq += 1
                continue
            os.remove(tmp)
            return manifest

    # ---- maintenance ---------------------------------------------------------
    def compact(self, spark) -> dict | None:
        """Rewrite all committed snapshots into one (the analogue of
        Iceberg's ``rewrite_data_files`` + snapshot expiry).

        Compaction bounds manifest count and file count (many small
        appends → one file per bucket).  The new snapshot's manifest is
        written BEFORE the old manifests are removed, and
        ``snapshots()`` treats a ``compacted`` manifest as superseding
        every lower sequence — so a crash at ANY point (including
        between the manifest write and the removes) leaves a readable,
        duplicate-free table; committed_buckets/partitioning are
        preserved.  Old data dirs are left in place, never referenced.
        """
        snaps = self.snapshots()
        if len(snaps) <= 1:
            return None
        full = self.read(spark)
        layout = self.partitioning()
        bucket_col = "bucket"
        parent = snaps[-1]
        snap_n = parent["sequence"] + 1
        data_dir = os.path.join(
            self.path, "data", f"snap-{snap_n}-{uuid.uuid4().hex[:8]}"
        )
        full.repartition(bucket_col).write.partitionBy(bucket_col).mode(
            "overwrite"
        ).parquet(data_dir)

        written = spark.read.option("basePath", data_dir).parquet(data_dir)
        rows = written.groupBy(bucket_col).count().collect()
        bucket_rows = {str(r[bucket_col]): r["count"] for r in rows}
        # job-level metrics are additive counters (docs parsed, spans
        # emitted, malformed fallbacks): key-wise sum the folded
        # snapshots' metrics so compaction never destroys them.
        # stream_batch_id is an IDENTITY, not a counter — summing it
        # would both erase the replay records and fabricate a future
        # batch id (review r5 #3: merged 0+1+2=3 would silently drop
        # real batch 3); fold ids into a stream_batch_ids list instead
        merged_metrics: dict = {}
        stream_ids: set = set()
        for s in snaps:
            for k, v in (s.get("metrics") or {}).items():
                if k == "stream_batch_id":
                    stream_ids.add(v)
                elif k == "stream_batch_ids":
                    stream_ids.update(v)
                elif isinstance(v, (int, float)) and not isinstance(v, bool):
                    merged_metrics[k] = merged_metrics.get(k, 0) + v
        if stream_ids:
            merged_metrics["stream_batch_ids"] = sorted(stream_ids)
        manifest = {
            "sequence": snap_n,
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": parent["snapshot_id"],
            "data_dir": data_dir,
            "data_files": self._list_data_files(data_dir),
            "bucket_rows": bucket_rows,
            "total_rows": int(sum(bucket_rows.values())),
            "metrics": {**merged_metrics, "compacted_snapshots": len(snaps)},
            "partitioning": layout,
            "compacted": True,
        }
        cur_schema = self.current_schema()
        if cur_schema is not None:
            # data was rewritten through read() → CURRENT names
            manifest["schema_id"] = cur_schema["schema_id"]
        # require_parent: a compacted manifest supersedes everything
        # below its sequence, so it is only valid for the EXACT
        # history it folded — if any append won a sequence in the
        # meantime, publishing would shadow data this rewrite never
        # read.  Abort instead; the rewrite dir is provably
        # unreferenced at this point, so drop it (under contention +
        # auto_compact each aborted attempt would otherwise leak a
        # full-table-sized directory).
        if self._commit_manifest(manifest, require_parent=True) is None:
            import shutil

            shutil.rmtree(data_dir, ignore_errors=True)
            return None
        # the new manifest is durable; superseded manifests can go
        for s in snaps:
            old = os.path.join(self.manifest_dir, f"snap-{s['sequence']:06d}.json")
            if os.path.exists(old):
                os.remove(old)
        return manifest

    # ---- write / commit ----------------------------------------------------
    def commit_append(
        self,
        df: DataFrame,
        partition_col: str = "bucket",
        metrics: dict | None = None,
        metrics_provider=None,
        partitioning: dict | None = None,
        compact: bool = True,
        auto_compact_every: int | None = None,
    ) -> dict | None:
        """Write ``df`` partitioned by ``partition_col`` and commit a
        snapshot manifest recording per-bucket lineage row counts (and
        the bucket layout, see :meth:`partitioning`).

        ``compact=True`` repartitions on ``partition_col`` first: a
        partitionBy write from K upstream tasks otherwise emits up to
        K files PER bucket — the classic small-files problem (64 tasks
        × 1088 buckets ≈ 70k files per commit at production layout).
        The extra shuffle happens after the expensive compute and
        yields exactly one file per non-empty bucket.

        ``auto_compact_every=N`` folds the table down to one snapshot
        whenever the active-snapshot count reaches N after this commit
        — bounds manifest/file growth for long incremental jobs
        without a separate maintenance job."""
        parent = self.current_snapshot()
        snap_n = (parent["sequence"] + 1) if parent else 0
        # uuid-suffixed data dir: concurrent writers must never share
        # a directory (the sequence race is settled later, at the
        # manifest link — see _commit_manifest; reads use the
        # manifest's file list, never the dir name)
        data_dir = os.path.join(
            self.path, "data", f"snap-{snap_n}-{uuid.uuid4().hex[:8]}"
        )

        # schema tracking: first non-empty commit registers schema v0
        # from the frame; later commits must match the CURRENT schema
        # exactly — names AND types (a new column requires an explicit
        # evolve() first; the append is refused at the write instead
        # of corrupting reads far from the cause)
        schema = self.current_schema()
        if schema is not None:
            self._validate_append_schema(df, schema, partition_col)

        out = df.repartition(partition_col) if compact else df
        out.write.partitionBy(partition_col).mode("overwrite").parquet(data_dir)

        # empty input (e.g. resume with nothing pending) writes no
        # partition dirs — detect via listing, drop the husk, no snapshot
        has_data = any(
            name.startswith(f"{partition_col}=")
            for name in (os.listdir(data_dir) if os.path.isdir(data_dir) else [])
        )
        if not has_data:
            import shutil

            shutil.rmtree(data_dir, ignore_errors=True)
            return None

        # lineage: rows per bucket of what we just wrote (cheap: parquet
        # footer counts via a metadata-only scan of the new dir)
        spark = df.sparkSession
        written = spark.read.option("basePath", data_dir).parquet(data_dir)
        rows = written.groupBy(partition_col).count().collect()
        bucket_rows = {str(r[partition_col]): r["count"] for r in rows}
        if not bucket_rows:
            return None

        if schema is None:
            # register v0 only now that the commit is known non-empty:
            # an empty first append (day-1 corpus filtered to nothing)
            # must not pin the table schema from a throwaway frame.
            # _write_schema arbitrates concurrent first commits — a
            # loser gets the WINNER's v0 back and must re-validate
            # against it (both writers skipped validation above); on
            # mismatch, drop our never-referenced data dir and refuse
            schema = self._write_schema(self._schema_from_df(df, partition_col))
            try:
                self._validate_append_schema(df, schema, partition_col)
            except ValueError:
                import shutil

                shutil.rmtree(data_dir, ignore_errors=True)
                raise

        if metrics_provider is not None:
            # e.g. an Observation: resolvable only after the write
            # action above has completed
            metrics = {**(metrics or {}), **metrics_provider()}

        manifest = {
            "sequence": snap_n,
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": parent["snapshot_id"] if parent else None,
            "data_dir": data_dir,
            "data_files": self._list_data_files(data_dir),
            "bucket_rows": bucket_rows,
            "total_rows": int(sum(bucket_rows.values())),
            "metrics": metrics or {},
            "partitioning": partitioning or (parent or {}).get("partitioning"),
            "schema_id": schema["schema_id"],
        }
        manifest = self._commit_manifest(manifest)
        if auto_compact_every and len(self.snapshots()) >= auto_compact_every:
            compacted = self.compact(spark)
            if compacted is not None:
                # return the APPEND manifest: callers read their own
                # commit's metrics from the return value (the job
                # report would otherwise show compaction bookkeeping
                # instead of the run's parse/malformed counters); the
                # durable table state is the compacted snapshot.
                manifest["compaction"] = compacted["snapshot_id"]
        return manifest
