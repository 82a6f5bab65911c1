"""Parquet-backed persistence for the monitor tables.

The reference persists through ActiveRecord into MySQL/Postgres
(config/database.yml:1-20): job_data appends (db/schema.rb:29-36),
job_errors insert/update (:38-48), jobs.status/next_run updates (:55-62).
Our store keeps the same tables as parquet directories, with the RDBMS's
transactional properties re-created file-system-first (SURVEY.md §4.2 #4):

- **Crash-safe swap** — every overwrite writes a fresh versioned
  directory and then atomically repoints a CURRENT pointer file
  (``os.replace``); there is no window where the table is deleted but
  its replacement not yet in place (round 1's rmtree-then-rename was).
- **Version guard (CAS)** — ``overwrite(..., expect_version=)`` fails
  with ``ConcurrentWriteError`` when the table moved since the caller's
  snapshot, and the claim file (O_CREAT|O_EXCL) serializes two writers
  racing to produce the same next version.  The scheduler claims the
  monitors table first thing in a tick, so an overlapped tick aborts
  before persisting job_data or dispatching alerts — the exactly-once
  status-transition contract under concurrent ticks.
- **Append-only job_data** never mutates; ids are content-derived
  (xxhash64(job_id, scheduled_ts)) so a re-run of the same tick writes
  the same ids instead of colliding per-batch counters.

Config tables are dimension-scale: full rewrite per tick is bounded and
cheap.

The mechanism is split generic-core / typed-store: the schema-agnostic
:class:`VersionedParquetTables` is the parquet implementation behind
``rearview_spark.sources.table_format`` (the single place the
Delta/Iceberg deployment swap is documented); :class:`JobStore` adds the
monitor schemas and the reference's typed operations on top.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from rearview_spark.monitors import schemas


class ConcurrentWriteError(RuntimeError):
    """The table version moved past the caller's snapshot (lost-update
    guard), or another writer claimed the same next version."""


class VersionedParquetTables:
    """Schema-agnostic core of the versioned-parquet mechanism: the
    CURRENT-pointer swap, O_EXCL claim/CAS, TTL orphan reclaim, staging
    dirs, sidecars, and pruning documented in the module docstring.
    This is the in-sandbox implementation of the transactional-table
    contract (`rearview_spark.sources.table_format.TableFormat`) — the
    one place the Delta/Iceberg deployment boundary is named; every
    crash/replay test that drives :class:`JobStore` exercises exactly
    this class's machinery."""

    def __init__(self, spark: SparkSession, root: str, claim_ttl_s: float = 60.0):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        # A claim file older than this with CURRENT still below its version
        # is treated as a hard-crashed writer's orphan and reclaimed. The
        # TTL protects a LIVE writer mid-write (config tables write in
        # seconds); tests set 0 to exercise the reclaim path directly.
        self.claim_ttl_s = claim_ttl_s

    # -- versioned table layout ---------------------------------------------
    #
    # root/<table>.versions/v00000003/   <- parquet data, one dir per version
    # root/<table>.versions/v00000003.claim  <- writer's exclusive claim
    # root/<table>.CURRENT               <- pointer file, atomically replaced
    # root/<table>/                      <- legacy unversioned dir (read-only
    #                                       fallback, version 0)

    def _versions_dir(self, table: str) -> Path:
        return self.root / f"{table}.versions"

    def _pointer(self, table: str) -> Path:
        return self.root / f"{table}.CURRENT"

    def _legacy_path(self, table: str) -> Path:
        return self.root / table

    def current_version(self, table: str) -> tuple[int, Path | None]:
        """(version number, data path) of the table's current contents.
        0/None means empty; 0/path means a legacy unversioned dir."""
        ptr = self._pointer(table)
        if ptr.exists():
            vname = ptr.read_text().strip()
            return int(vname[1:]), self._versions_dir(table) / vname
        legacy = self._legacy_path(table)
        if legacy.exists() and any(legacy.iterdir()):
            return 0, legacy
        return 0, None

    def read_table(self, table: str, schema) -> DataFrame:
        """Current snapshot under an explicit schema (empty frame when
        the table has never been written)."""
        _, path = self.current_version(table)
        if path is None:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(str(path))

    def append(self, table: str, df: DataFrame, partition_by: tuple = ()) -> None:
        # Appends target the legacy dir: Spark part-file names are unique
        # per write, so concurrent appends are additive (never lost), and
        # versioned overwrite is reserved for the mutable config tables.
        # ``partition_by`` serves partition-pruned append-only stores
        # (the incremental-dedup pfx= layout).
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(str(self._legacy_path(table)))

    def _claim(self, table: str, vdir: Path, vname: Path, nxt: int, token: str) -> Path:
        """Take the O_EXCL claim for version ``nxt`` and record ``token``
        (the fencing identity) inside it; on conflict, reclaim a
        hard-crashed writer's orphan (claim older than ``claim_ttl_s``
        with CURRENT still below ``nxt`` — a live writer finishes its
        config-scale write well inside the TTL) and retry once."""
        import time

        claim = vdir / f"{vname.name}.claim"
        for attempt in (0, 1):
            try:
                fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                try:
                    os.write(fd, token.encode())
                    os.fsync(fd)
                finally:
                    os.close(fd)
                return claim
            except FileExistsError:
                cur_now, _ = self.current_version(table)
                try:
                    age = time.time() - claim.stat().st_mtime
                except FileNotFoundError:
                    continue  # owner just released it; retry the claim
                if attempt == 0 and cur_now < nxt and age >= self.claim_ttl_s:
                    # orphan: the claimer died between claim and pointer
                    # swap. Remove its published-name dir, any stranded
                    # writer staging dirs for this version, and the claim,
                    # then retry. If the "orphan" is actually a live-but-
                    # stalled writer, the token it wrote into the claim is
                    # now gone, so its pre-publish fencing check fails and
                    # it aborts instead of racing us (ADVICE r04 #1).
                    shutil.rmtree(vname, ignore_errors=True)
                    for stranded in vdir.glob(f"{vname.name}.w-*"):
                        shutil.rmtree(stranded, ignore_errors=True)
                    claim.unlink(missing_ok=True)
                    continue
                raise ConcurrentWriteError(
                    f"{table}: version {nxt} already claimed by another writer"
                ) from None
        raise ConcurrentWriteError(f"{table}: could not claim version {nxt}")

    def _owns_claim(self, claim: Path, token: str) -> bool:
        try:
            return claim.read_text() == token
        except FileNotFoundError:
            return False

    def overwrite(
        self,
        table: str,
        df: DataFrame,
        expect_version: int | None = None,
        sidecars: dict[str, DataFrame] | None = None,
    ) -> int:
        """Atomic versioned swap; returns the new version number.

        With ``expect_version`` this is a compare-and-swap: it fails if
        the table has moved since the caller read that version, and the
        O_EXCL claim file closes the race of two writers who both saw
        the same current version.

        ``sidecars`` maps underscore-prefixed subdir names to frames
        written INSIDE the new version dir before the pointer swap — the
        pointer flip commits table + sidecars atomically together (the
        underscore prefix hides them from the table's own parquet read).
        The scheduler uses this to make the pending-alert outbox part of
        the same committed write as the status transitions.
        """
        cur, _ = self.current_version(table)
        if expect_version is not None and cur != expect_version:
            raise ConcurrentWriteError(
                f"{table}: version moved {expect_version} -> {cur}"
            )
        nxt = cur + 1
        vname_s = f"v{nxt:08d}"
        vdir = self._versions_dir(table)
        vdir.mkdir(exist_ok=True)
        token = uuid.uuid4().hex
        claim = self._claim(table, vdir, vdir / vname_s, nxt, token)
        # Each writer stages into its OWN token-suffixed dir — two writers
        # can never interleave part files in one directory, even across a
        # TTL reclaim (ADVICE r04 #1: the old shared-dir write could
        # publish a mix of two writers' files). The stem still parses as
        # version ``nxt``, so _prune collects abandoned staging dirs.
        wdir = vdir / f"{vname_s}.w-{token}"
        tmp = self.root / f".{table}.CURRENT.{uuid.uuid4().hex}"
        published = False
        try:
            df.write.mode("overwrite").parquet(str(wdir))
            for sub, sdf in (sidecars or {}).items():
                assert sub.startswith("_"), "sidecar dirs must be underscore-hidden"
                sdf.write.mode("overwrite").parquet(str(wdir / sub))
            # Fencing: re-verify we still own the claim IMMEDIATELY before
            # publishing. A reclaimer that stole the claim (TTL expiry
            # during a stalled write) deleted/replaced the claim file, so
            # the token no longer matches and we abort rather than
            # double-publish version ``nxt``.
            if not self._owns_claim(claim, token):
                raise ConcurrentWriteError(
                    f"{table}: claim for version {nxt} was reclaimed by another "
                    "writer during a stalled write; aborting publish"
                )
            os.rename(wdir, vdir / vname_s)  # fails if the thief published first
            published = True
            tmp.write_text(vname_s)
            # Re-verify ownership once more between the rename and the
            # pointer flip: a TTL reclaimer firing in that gap rmtrees the
            # just-renamed vname dir, and flipping CURRENT afterwards would
            # point at deleted/being-rewritten data (ADVICE r05 #2). This
            # shrinks the window to the single os.replace syscall; the
            # residual race is inherent to TTL-based file locking — a
            # reclaimer can always fire between any check and the flip.
            # Deployments must set claim_ttl_s >> worst-case publish time.
            if not self._owns_claim(claim, token):
                raise ConcurrentWriteError(
                    f"{table}: claim for version {nxt} was reclaimed between "
                    "publish and pointer flip; aborting"
                )
            os.replace(tmp, self._pointer(table))  # atomic on POSIX
        except BaseException:
            # A claim whose write never advanced CURRENT would wedge the
            # table: every later overwrite computes the same next version
            # and hits the O_EXCL claim forever (ADVICE r02).  Release the
            # claim, drop the staging/version dirs, and clear the temp
            # pointer so the next attempt can re-claim litter-free — but
            # ONLY what this writer still owns: after a claim theft the
            # published-name dir and the claim belong to the thief.
            shutil.rmtree(wdir, ignore_errors=True)
            tmp.unlink(missing_ok=True)
            if self._owns_claim(claim, token):
                if published:
                    shutil.rmtree(vdir / vname_s, ignore_errors=True)
                claim.unlink(missing_ok=True)
            raise
        self._prune(table, keep_from=nxt - 1)
        return nxt

    def _prune(self, table: str, keep_from: int) -> None:
        """Drop versions older than the previous one (kept for readers
        holding the prior snapshot) and the legacy dir once versioned."""
        vdir = self._versions_dir(table)
        for p in vdir.iterdir():
            stem = p.name.split(".")[0]
            if stem.startswith("v") and stem[1:].isdigit() and int(stem[1:]) < keep_from:
                shutil.rmtree(p, ignore_errors=True) if p.is_dir() else p.unlink(missing_ok=True)
        legacy = self._legacy_path(table)
        if legacy.exists() and self._pointer(table).exists():
            shutil.rmtree(legacy, ignore_errors=True)


class JobStore(VersionedParquetTables):
    """Monitor-table persistence: the generic versioned core plus the
    schema map and the reference's typed operations (save_monitors with
    the atomic outbox sidecar, job_data appends, dispatch log)."""

    def read(self, table: str) -> DataFrame:
        return self.read_table(
            table,
            {
                "monitors": schemas.MONITORS,
                "job_data": schemas.JOB_DATA,
                "job_errors": schemas.JOB_ERRORS,
                "applications": schemas.APPLICATIONS,
                "users": schemas.USERS,
            }[table],
        )

    # -- typed operations ---------------------------------------------------

    def save_monitors(
        self,
        df: DataFrame,
        expect_version: int | None = None,
        outbox: DataFrame | None = None,
    ) -> int:
        """Swap the monitors table; when ``outbox`` is given, its rows are
        committed in the SAME pointer flip (sidecar ``_outbox``) — the
        status transitions and the alerts they owe become visible
        atomically together.

        Still-undispatched rows from the PREVIOUS version's outbox are
        always carried forward into the new sidecar (union, deduped by
        deterministic id). Without this, any save_monitors call between a
        crash and the next tick's opening drain — e.g. a user registering
        a monitor — would silently discard the owed alerts, and the
        at-least-once guarantee would hold only if the scheduler were the
        sole writer (ADVICE r04 #2)."""
        carried = self._undispatched_outbox()
        if carried is not None and outbox is not None:
            outbox = carried.unionByName(outbox).dropDuplicates(["id"])
        elif carried is not None:
            outbox = carried
        sidecars = {"_outbox": outbox} if outbox is not None else None
        return self.overwrite("monitors", df, expect_version, sidecars=sidecars)

    def _undispatched_outbox(self) -> DataFrame | None:
        """Pending rows of the current version's outbox, or None when the
        current version carries no outbox sidecar (the common case — one
        existence check, no Spark job)."""
        _, path = self.current_version("monitors")
        if path is None or not (Path(path) / "_outbox").exists():
            return None
        return (
            self.read_outbox()
            .dropDuplicates(["id"])
            .join(self._read_dispatch_log(), "id", "left_anti")
        )

    def read_outbox(self) -> DataFrame:
        """The current monitors version's alert outbox (empty frame when
        the version carried none)."""
        _, path = self.current_version("monitors")
        if path is not None and (Path(path) / "_outbox").exists():
            return self.spark.read.schema(schemas.ALERT_OUTBOX).parquet(
                str(Path(path) / "_outbox")
            )
        return self.spark.createDataFrame([], schemas.ALERT_OUTBOX)

    def pending_alerts(self) -> list:
        """Outbox rows not yet marked dispatched, oldest first. Config
        scale (bounded by alerts-per-tick), so a driver collect is fine."""
        from pyspark.sql import functions as F

        dispatched = self._read_dispatch_log()
        return (
            self.read_outbox()
            .dropDuplicates(["id"])
            .join(dispatched, "id", "left_anti")
            .orderBy(F.col("fired_at"), F.col("id"))
            .collect()
        )

    def _read_dispatch_log(self) -> DataFrame:
        path = self._legacy_path("alert_dispatches")
        if path.exists() and any(path.iterdir()):
            return self.spark.read.schema(schemas.ALERT_DISPATCHES).parquet(str(path))
        return self.spark.createDataFrame([], schemas.ALERT_DISPATCHES)

    def mark_alert_dispatched(self, alert_id: int, now: dt.datetime) -> None:
        self.append(
            "alert_dispatches",
            self.spark.createDataFrame([(alert_id, now)], schemas.ALERT_DISPATCHES),
        )

    def append_job_data(self, run_results: DataFrame, now: dt.datetime) -> None:
        """Materialize run results as job_data rows (R12/S8).

        ``id`` is xxhash64(job_id, scheduled_ts): unique per (job, tick)
        and *deterministic*, so an idempotent re-run of a tick reproduces
        the same ids (round 1's monotonically_increasing_id restarted per
        batch and collided across ticks, ADVICE r01)."""
        from pyspark.sql import functions as F

        rows = run_results.select(
            F.xxhash64(F.col("job_id"), F.col("scheduled_ts")).alias("id"),
            F.col("job_id"),
            F.lit(now).alias("created_at"),
            F.lit(now).alias("updated_at"),
            F.struct(
                F.col("status"),
                F.col("output"),
                F.col("graph_data"),
            ).alias("data"),
        )
        self.append("job_data", rows)

    def latest_job_data(self) -> DataFrame:
        """R8 — latest result per job via row_number window."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy("job_id").orderBy(F.col("updated_at").desc(), F.col("id").desc())
        return (
            self.read("job_data")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
