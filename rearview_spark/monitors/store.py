"""Parquet-backed persistence for the monitor tables.

The reference persists through ActiveRecord into MySQL/Postgres
(config/database.yml:1-20): job_data appends (db/schema.rb:29-36),
job_errors insert/update (:38-48), jobs.status/next_run updates (:55-62).
Our store keeps the same tables as parquet directories, with the RDBMS's
transactional properties re-created file-system-first (SURVEY.md §4.2 #4;
Delta MERGE would provide the same in a cluster, but Delta jars aren't in
this container):

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


class JobStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

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

    def read(self, table: str) -> DataFrame:
        schema = {
            "monitors": schemas.MONITORS,
            "job_data": schemas.JOB_DATA,
            "job_errors": schemas.JOB_ERRORS,
            "applications": schemas.APPLICATIONS,
            "users": schemas.USERS,
        }[table]
        _, path = self.current_version(table)
        if path is None:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(str(path))

    def append(self, table: str, df: DataFrame) -> None:
        # Appends target the legacy dir: Spark part-file names are unique
        # per write, so concurrent appends are additive (never lost), and
        # versioned overwrite is reserved for the mutable config tables.
        df.write.mode("append").parquet(str(self._legacy_path(table)))

    def overwrite(
        self, table: str, df: DataFrame, expect_version: int | None = None
    ) -> int:
        """Atomic versioned swap; returns the new version number.

        With ``expect_version`` this is a compare-and-swap: it fails if
        the table has moved since the caller read that version, and the
        O_EXCL claim file closes the race of two writers who both saw
        the same current version.
        """
        cur, _ = self.current_version(table)
        if expect_version is not None and cur != expect_version:
            raise ConcurrentWriteError(
                f"{table}: version moved {expect_version} -> {cur}"
            )
        nxt = cur + 1
        vname = f"v{nxt:08d}"
        vdir = self._versions_dir(table)
        vdir.mkdir(exist_ok=True)
        claim = vdir / f"{vname}.claim"
        try:
            fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            raise ConcurrentWriteError(
                f"{table}: version {nxt} already claimed by another writer"
            ) from None
        try:
            df.write.mode("overwrite").parquet(str(vdir / vname))
            tmp = self.root / f".{table}.CURRENT.{uuid.uuid4().hex}"
            tmp.write_text(vname)
            os.replace(tmp, self._pointer(table))  # atomic on POSIX
        except BaseException:
            # A claim whose write never advanced CURRENT would wedge the
            # table: every later overwrite computes the same next version
            # and hits the O_EXCL claim forever (ADVICE r02).  Release the
            # claim and drop the partial version dir so the next attempt
            # can re-claim.  (A hard crash between claim and swap leaves a
            # stale claim; current_version-aware reclaim below covers it.)
            shutil.rmtree(vdir / vname, ignore_errors=True)
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

    # -- typed operations ---------------------------------------------------

    def save_monitors(self, df: DataFrame, expect_version: int | None = None) -> int:
        return self.overwrite("monitors", df, expect_version)

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
