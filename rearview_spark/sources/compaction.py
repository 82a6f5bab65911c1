"""Small-file compaction for the streaming-ingested metrics table.

Why this exists: ``ingest_to_metrics`` (streaming/ingest.py) appends a
few files per micro-batch per date partition. At a 100 TB cluster's
ingest cadence (a trigger every few seconds, hundreds of partitions)
that accretes tens of thousands of KB-sized files per day — and small
files are the classic parquet scan killer: per-file open/footer costs
dominate, row-group stats stop pruning, and the driver's file listing
itself becomes the bottleneck. Table formats solve this with OPTIMIZE
(Delta/Iceberg); their jars are not in this container, so this module
implements the same maintenance pass over the plain-directory layout
``write_metrics_dir`` produces (sources/layout.py:38) — read a date
partition, re-sort by (metric, ts), write few large files.

The hard part is NOT the rewrite — it is the file sink's transaction
log. A Structured Streaming parquet sink maintains ``_spark_metadata``
at the table root; when that directory exists, a batch read of the ROOT
path lists files from the log, not the filesystem. Naive compaction
therefore makes the new files invisible and the deleted ones poison
every read with FileNotFound. ``optimize_metrics_dir`` handles the log
explicitly (the on-disk "v1" JSON-lines format is a stable public
format, written by Spark's FileStreamSinkLog):

- earlier batch files are rewritten as valid empty logs (``v1`` header,
  zero entries) — names and batch ids preserved, so the restarted
  stream's compact-interval bookkeeping is untouched;
- the LATEST batch file is rewritten to list every live data file
  (for compacted partitions the new files, for untouched partitions
  their existing files);
- ``latestBatchId`` therefore never changes, so a restarted ingest
  stream skips an already-committed batch exactly as before — the
  sink's idempotent-retry contract survives compaction.

Crash safety: all new files are moved into the live partition dirs
BEFORE any destructive step, a JSON manifest of (old files to delete,
new files added) is persisted next to the log, and only then are the
log rewritten and the old files deleted. A crash mid-way leaves the
manifest behind; the next ``optimize_metrics_dir`` call replays it to
completion before doing new work, so the operation is resumable and
re-runnable. (Directory renames are avoided entirely — every mutation
is per-file — so the scheme also works on object stores, where the
maintenance-window requirement below is the only extra care needed.)

Operational contract (documented, not enforceable from here): run this
while the ingest stream into ``path`` is STOPPED — e.g. from the same
scheduler slot that owns the stream, between ``stop()`` and restart.
Cadence: daily against the previous day's partition is the standard
pattern (yesterday's partition stops receiving appends once the
watermark passes midnight, so compacting closed partitions never races
ingest even operationally).

Scale: each partition's rewrite is one executor-side read+sort+write of
that partition only; the driver handles file LISTS (thousands of names,
never data). Partitions are processed independently, so a cluster job
can fan them out; compaction cost is proportional to the data touched,
which the ``partitions`` argument bounds (compact only closed days).
"""

from __future__ import annotations

import json
import math
import posixpath

from pyspark.sql import SparkSession

from rearview_spark.sources.layout import DEFAULT_MAX_RECORDS_PER_FILE

MANIFEST_NAME = "_compact_manifest.json"
TMP_DIR_NAME = ".compact_tmp"
SINK_LOG_DIR = "_spark_metadata"
SINK_LOG_VERSION = "v1"


# --------------------------------------------------------------------------
# Hadoop FileSystem helpers (py4j; the public Hadoop FS API, so the same
# code path serves file://, hdfs://, and (rename caveats aside) s3a://).
# --------------------------------------------------------------------------

def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, jpath


def _jpath(jvm, p: str):
    return jvm.org.apache.hadoop.fs.Path(p)


def _read_text(fs, jvm, p: str) -> str:
    stream = fs.open(_jpath(jvm, p))
    try:
        return bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        ).decode("utf-8")
    finally:
        stream.close()


def _write_text(fs, jvm, p: str, text: str) -> None:
    out = fs.create(_jpath(jvm, p), True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _list_status(fs, jvm, p: str):
    return list(fs.listStatus(_jpath(jvm, p)))


def _is_hidden(name: str) -> bool:
    return name.startswith(".") or name.startswith("_")


# --------------------------------------------------------------------------
# Sink-log rewrite
# --------------------------------------------------------------------------

def _sink_batch_id(name: str):
    base = name[: -len(".compact")] if name.endswith(".compact") else name
    return int(base) if base.isdigit() else None


def _latest_sink_batch(spark: SparkSession, root: str):
    """Highest batch id in ``_spark_metadata`` (None when there is no
    sink log, or it is empty). Cheap — one directory listing — so it
    doubles as the concurrent-ingest tripwire: a running file-sink
    writer advances this id with every committed micro-batch."""
    jvm, fs, _ = _fs(spark, root)
    log_dir = posixpath.join(root, SINK_LOG_DIR)
    if not fs.exists(_jpath(jvm, log_dir)):
        return None
    ids = [
        _sink_batch_id(s.getPath().getName())
        for s in _list_status(fs, jvm, log_dir)
        if not s.isDirectory()
    ]
    ids = [i for i in ids if i is not None]
    return max(ids) if ids else None


def _rewrite_sink_log(spark: SparkSession, root: str, live_files: list) -> None:
    """Rewrite ``_spark_metadata`` so its union equals ``live_files``
    (list of (uri, size, mtime_ms)) without changing latestBatchId:
    every batch file but the latest becomes an empty valid log, the
    latest lists everything. No-op when the log directory is absent
    (batch-written table)."""
    jvm, fs, _ = _fs(spark, root)
    log_dir = posixpath.join(root, SINK_LOG_DIR)
    if not fs.exists(_jpath(jvm, log_dir)):
        return

    names = [
        s.getPath().getName()
        for s in _list_status(fs, jvm, log_dir)
        if not s.isDirectory() and _sink_batch_id(s.getPath().getName()) is not None
    ]
    if not names:
        return
    latest = max(names, key=_sink_batch_id)

    entries = "".join(
        json.dumps(
            {
                "path": uri,
                "size": size,
                "isDir": False,
                "modificationTime": mtime,
                "blockReplication": 1,
                "blockSize": 33554432,
                "action": "add",
            },
            separators=(",", ":"),
        )
        + "\n"
        for uri, size, mtime in sorted(live_files)
    )
    for name in names:
        body = SINK_LOG_VERSION + "\n" + (entries if name == latest else "")
        _write_text(fs, jvm, posixpath.join(log_dir, name), body)


# --------------------------------------------------------------------------
# Manifest (crash-safe resume)
# --------------------------------------------------------------------------

def _apply_manifest(spark: SparkSession, root: str, manifest: dict) -> None:
    """Finish a compaction from its manifest: perform any still-pending
    tmp→live moves, rewrite the sink log to the recorded live set, then
    delete the recorded old files and the manifest itself. Idempotent —
    every step tolerates having already happened (a move whose source
    is gone and whose destination exists was already done), so a crash
    at ANY point after the manifest commits is completed by replay."""
    jvm, fs, _ = _fs(spark, root)
    for src, dst in manifest.get("moves", []):
        src_p, dst_p = _jpath(jvm, src), _jpath(jvm, dst)
        if fs.exists(dst_p):
            # "already moved" is only safe when the source is gone
            # (replaying past a completed rename). When BOTH exist
            # (copy-based FS crashed mid-move, or a genuine name
            # collision), require equal lengths AND — where the FS
            # exposes one (HDFS does; local FS returns null) — equal
            # checksums before treating dst as the finished move; a
            # pre-existing different file under the destination name
            # must fail loudly, never silently swallow the compacted
            # tmp file when the tmp dir is deleted below (ADVICE r08
            # #1; checksum per r09 review #7 — length alone can agree
            # on fixed-row-group parquet of different content).
            if fs.exists(src_p):
                src_len = fs.getFileStatus(src_p).getLen()
                dst_len = fs.getFileStatus(dst_p).getLen()
                if src_len != dst_len:
                    raise IOError(
                        f"compaction collision: {dst} already exists with "
                        f"{dst_len} B while source {src} still holds "
                        f"{src_len} B — refusing to discard the tmp file"
                    )
                src_ck = fs.getFileChecksum(src_p)
                dst_ck = fs.getFileChecksum(dst_p)
                if src_ck is None or dst_ck is None:
                    # No FS checksum (raw local FS, many object stores):
                    # equal length alone must NOT pass — compare bytes
                    # (JVM-side stream compare; files are
                    # compaction-sized and this path is the rare
                    # equal-length collision, ADVICE r09 #4).
                    s_in, d_in = fs.open(src_p), fs.open(dst_p)
                    try:
                        same = jvm.org.apache.commons.io.IOUtils.contentEquals(
                            s_in, d_in
                        )
                    finally:
                        s_in.close()
                        d_in.close()
                elif src_ck.equals(dst_ck):
                    same = True
                else:
                    same = False
                if not same:
                    raise IOError(
                        f"compaction collision: {dst} exists with the same "
                        f"length as source {src} but different content — "
                        "refusing to discard the tmp file"
                    )
            continue
        if not fs.rename(src_p, dst_p):
            raise IOError(f"rename failed: {src} -> {dst}")
    _rewrite_sink_log(spark, root, [tuple(e) for e in manifest["live_files"]])
    for p in manifest["delete_files"]:
        fs.delete(_jpath(jvm, p), False)
    tmp = posixpath.join(root, TMP_DIR_NAME)
    if fs.exists(_jpath(jvm, tmp)):
        fs.delete(_jpath(jvm, tmp), True)
    fs.delete(_jpath(jvm, posixpath.join(root, MANIFEST_NAME)), False)


def resume_pending_compaction(spark: SparkSession, path: str) -> bool:
    """Replay a crashed run's manifest if one exists. Returns True when
    there was something to finish."""
    jvm, fs, _ = _fs(spark, path)
    mpath = posixpath.join(path, MANIFEST_NAME)
    if not fs.exists(_jpath(jvm, mpath)):
        return False
    manifest = json.loads(_read_text(fs, jvm, mpath))
    _apply_manifest(spark, path, manifest)
    return True


# --------------------------------------------------------------------------
# The maintenance operator
# --------------------------------------------------------------------------

#: partition-name key used when a directory has no dt= partitions and
#: the ROOT itself is compacted as one unit (e.g. the incremental-dedup
#: signature store, a flat append-written parquet dir)
ROOT_PARTITION = "."


def _tmp_name(partition_name: str) -> str:
    """Tmp subdir for a partition's rewrite. The flat-root unit reports
    as '.', but a '.' PATH component is rejected by HDFS
    (DFSUtilClient.isValidName) — use a sanitized name on disk."""
    return "_root" if partition_name == ROOT_PARTITION else partition_name


def optimize_metrics_dir(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    min_files: int = 4,
    partitions: list[str] | None = None,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    sort_cols: tuple[str, ...] | None = None,
) -> dict:
    """Compact small files in the parquet directory at ``path``,
    preserving the file sink's ``_spark_metadata`` semantics when
    present (module docstring). Two layouts:

    - **date-partitioned** (the metrics table): each ``dt=`` partition
      with >= ``min_files`` files is rewritten back to the
      ``write_metrics_dir`` layout (few large (metric, ts)-sorted
      files — sources/layout.py:38);
    - **flat** (no ``dt=`` subdirs — e.g. the incremental-dedup
      signature store, which appends one file set per micro-batch):
      the root is compacted as one unit, reported under the key
      ``"."``.

    ``sort_cols`` fixes the within-file sort; default: (metric, ts)
    when those columns exist, else the frame's first column (keeps
    min/max stats selective on the leading key — doc_id for the
    signature store).

    - ``target_file_mb``: aim for files of about this many on-disk MB;
      a partition is rewritten into ``ceil(total_bytes / target)``
      files (at least one, and never more rows per file than
      ``max_records_per_file``).
    - ``min_files``: partitions with fewer files are left alone (the
      rewrite would churn data for no layout gain).
    - ``partitions``: optional explicit list of partition dir names
      (e.g. ``["dt=2024-01-01"]``) — the closed-days cadence; default
      scans all.

    Returns ``{partition: {"files_before": n, "files_after": m,
    "bytes": b}}`` for the partitions actually rewritten.

    MUST run while the writer into ``path`` is stopped.
    """
    jvm, fs, root_jpath = _fs(spark, path)
    resume_pending_compaction(spark, path)
    # Concurrent-ingest tripwire (ADVICE r08 #2): the "writer must be
    # stopped" contract is enforced best-effort by snapshotting the sink
    # log's latest batch id now and re-checking it (a) before the
    # manifest commits — clean abort, nothing mutated — and (b) after
    # apply — loud failure naming the batch whose files the rewrite may
    # have orphaned.
    log_batch_before = _latest_sink_batch(spark, path)

    part_dirs = [
        s.getPath()
        for s in _list_status(fs, jvm, path)
        if s.isDirectory() and s.getPath().getName().startswith("dt=")
    ]
    flat = not part_dirs
    if flat:
        part_dirs = [root_jpath]
    if partitions is not None:
        wanted = set(partitions)
        part_dirs = [p for p in part_dirs if p.getName() in wanted]

    def data_files(dir_jpath):
        return [
            s
            for s in fs.listStatus(dir_jpath)
            if not s.isDirectory() and not _is_hidden(s.getPath().getName())
        ]

    target_bytes = target_file_mb * 1024 * 1024
    tmp_root = posixpath.join(path, TMP_DIR_NAME)
    report: dict = {}
    old_by_part: dict = {}
    for pdir in part_dirs:
        files = data_files(pdir)
        if len(files) < min_files:
            continue
        name = ROOT_PARTITION if flat else pdir.getName()
        total = sum(s.getLen() for s in files)
        if flat:
            # read the FILES, not the dir: the tmp subdir must not feed
            # back into its own rewrite on a re-run
            df = spark.read.parquet(*[s.getPath().toString() for s in files])
        else:
            df = spark.read.parquet(pdir.toString())
        cols = (
            sort_cols
            if sort_cols is not None
            else (
                ("metric", "ts")
                if {"metric", "ts"} <= set(df.columns)
                else (df.columns[0],)
            )
        )
        # one read total: the byte-derived file count sets parallel
        # output slices, and maxRecordsPerFile lets the WRITER enforce
        # the row cap (a df.count() here would re-scan every partition
        # just to pre-compute what the write option already guarantees)
        n_out = max(1, math.ceil(total / target_bytes))
        (
            df.coalesce(n_out)
            .sortWithinPartitions(*cols)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", max_records_per_file)
            .parquet(posixpath.join(tmp_root, _tmp_name(name)))
        )
        report[name] = {"files_before": len(files), "bytes": total}
        old_by_part[name] = [s.getPath().toString() for s in files]

    if not report:
        return report

    # plan the tmp -> live moves (destinations are knowable before any
    # mutation), then commit the manifest FIRST: from this point the
    # whole remainder — moves, log rewrite, deletes, cleanup — replays
    # idempotently from the manifest, so a crash anywhere leaves a
    # resumable state instead of a duplicated table (the moves-before-
    # manifest window would permanently double rows on log-less layouts)
    moves: list = []
    new_stats: list = []
    for name in report:
        dst_dir = path if name == ROOT_PARTITION else posixpath.join(path, name)
        outs = data_files(_jpath(jvm, posixpath.join(tmp_root, _tmp_name(name))))
        for s in outs:
            # scheme-qualify through the FS: the sink log must hold ONE
            # uri form — mixing "file:/x" (from listStatus) with bare
            # "/x" reads as two conflicting table roots
            dst = fs.makeQualified(
                _jpath(jvm, posixpath.join(dst_dir, s.getPath().getName()))
            ).toString()
            moves.append((s.getPath().toString(), dst))
            new_stats.append((dst, s.getLen(), s.getModificationTime()))
        report[name]["files_after"] = len(outs)

    # final live set = (current files minus the olds) plus the moved
    # destinations (rename preserves length and mtime)
    delete = {p for olds in old_by_part.values() for p in olds}
    live: list = list(new_stats)
    live_dirs = (
        [root_jpath]
        if flat
        else [
            s.getPath()
            for s in _list_status(fs, jvm, path)
            if s.isDirectory() and s.getPath().getName().startswith("dt=")
        ]
    )
    for d in live_dirs:
        for f in data_files(d):
            uri = f.getPath().toString()
            if uri not in delete:
                live.append((uri, f.getLen(), f.getModificationTime()))

    manifest = {
        "moves": moves,
        "live_files": live,
        "delete_files": sorted(delete),
    }
    if _latest_sink_batch(spark, path) != log_batch_before:
        # a micro-batch committed while we were planning: abort cleanly
        # (only the tmp dir was written; the table is untouched)
        fs.delete(_jpath(jvm, tmp_root), True)
        raise IOError(
            f"concurrent ingest detected at {path}: sink log advanced past "
            f"batch {log_batch_before} during compaction planning — stop the "
            "writer before running optimize_metrics_dir (nothing was changed)"
        )
    _write_text(
        fs, jvm, posixpath.join(path, MANIFEST_NAME), json.dumps(manifest)
    )
    _apply_manifest(spark, path, manifest)
    if _latest_sink_batch(spark, path) != log_batch_before:
        raise IOError(
            f"concurrent ingest detected at {path}: a micro-batch committed "
            f"after batch {log_batch_before} WHILE the sink log was being "
            "rewritten; its entry may list deleted files — stop the writer "
            "and re-ingest that batch"
        )
    return report


# --------------------------------------------------------------------------
# Scheduled maintenance (the cadence PLANS.md documents, as code)
# --------------------------------------------------------------------------

def closed_partitions(
    spark: SparkSession, path: str, now, watermark_days: int = 1
) -> list:
    """The ``dt=`` partitions closed to further appends at ``now``:
    strictly older than ``now - watermark_days`` days. With the ingest
    watermark bounded at minutes (streaming/ingest.py), any partition
    before yesterday can no longer receive late rows — compacting only
    these never races the (stopped-or-not) ingest stream's late data."""
    import datetime as dt

    jvm, fs, _ = _fs(spark, path)
    cutoff = (now - dt.timedelta(days=watermark_days)).date().isoformat()
    out = []
    for s in _list_status(fs, jvm, path):
        name = s.getPath().getName()
        if s.isDirectory() and name.startswith("dt=") and name[3:] < cutoff:
            out.append(name)
    return sorted(out)


def compaction_tick(
    spark: SparkSession, path: str, now, min_files: int = 4, **kwargs
) -> dict:
    """One scheduled maintenance pass: compact exactly the CLOSED date
    partitions (see :func:`closed_partitions`). Drive it from the same
    scheduler slot that owns the ingest stream — e.g. a daily
    ``monitors/cron.py`` entry — with the stream stopped around the
    call; time is injected (``now``) so backtests and golden tests
    replay deterministically, the same discipline as
    ``MonitorScheduler.tick``. Idempotent: already-compacted partitions
    fall under ``min_files`` and are skipped, so a retried tick is a
    no-op."""
    parts = closed_partitions(spark, path, now)
    if not parts:
        return {}
    return optimize_metrics_dir(
        spark, path, min_files=min_files, partitions=parts, **kwargs
    )
