"""Small-file compaction of the streaming-ingested metrics table
(sources/compaction.py): the ingest-then-compact cycle the 100 TB
deployment runs daily. The hard invariant under test is the file sink's
``_spark_metadata`` transaction log — after compaction, a ROOT-path read
(which lists files from the log, not the filesystem) must see exactly
the compacted data, and a RESTARTED ingest stream must keep appending
with its idempotence bookkeeping intact."""

from __future__ import annotations

import datetime as dt
import glob
import json
import os

from pyspark.sql import functions as F

from rearview_spark.sources.compaction import (
    MANIFEST_NAME,
    optimize_metrics_dir,
    resume_pending_compaction,
)
from rearview_spark.streaming.ingest import ingest_to_metrics

T0 = dt.datetime(2024, 1, 1)
SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _add_source_files(spark, src: str, lo: int, hi: int) -> None:
    """One single-row-group file per i — the pathological many-small-files
    producer. Days split at i >= 6 so two date partitions exist."""
    for i in range(lo, hi):
        day = T0 + dt.timedelta(days=1 if i >= 6 else 0)
        rows = [
            (i * 10 + j, day + dt.timedelta(minutes=i * 10 + j), j, "click", float(j), "{}")
            for j in range(5)
        ]
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _run_ingest(spark, src: str, out: str, ckpt: str) -> None:
    q = ingest_to_metrics(spark, src, out, ckpt)
    q.awaitTermination()


def test_ingest_compact_restart_cycle(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "m"), str(tmp_path / "c")
    _add_source_files(spark, src, 0, 8)
    _run_ingest(spark, src, out, ckpt)
    _add_source_files(spark, src, 8, 10)
    _run_ingest(spark, src, out, ckpt)

    files_before = glob.glob(out + "/dt=*/*.parquet")
    before = spark.read.parquet(out)
    rows_before, sum_before = before.count(), before.agg(F.sum("value")).first()[0]
    assert len(files_before) >= 8  # the small-file problem is real

    report = optimize_metrics_dir(spark, out, target_file_mb=128, min_files=2)
    assert set(report) == {"dt=2024-01-01", "dt=2024-01-02"}
    files_after = glob.glob(out + "/dt=*/*.parquet")
    assert len(files_after) == 2  # one ~target-sized file per partition
    assert not set(files_after) & set(files_before)

    # ROOT read goes through the rewritten _spark_metadata log: values
    # identical, and every file the log lists actually exists
    after = spark.read.parquet(out)
    assert after.count() == rows_before
    assert after.agg(F.sum("value")).first()[0] == sum_before
    # the compacted partition is (metric, ts)-sorted (layout contract)
    one = spark.read.parquet(files_after[0]).collect()
    assert one == sorted(one, key=lambda r: (r["metric"], r["ts"]))

    # restarted ingest appends a new batch on top of the compacted table:
    # no loss, no duplicates (event minutes are unique by construction)
    _add_source_files(spark, src, 10, 12)
    _run_ingest(spark, src, out, ckpt)
    final = spark.read.parquet(out)
    assert final.count() == rows_before + 10
    assert final.select("ts").distinct().count() == rows_before + 10


def test_compact_respects_min_files_and_partition_filter(spark, tmp_path):
    # batch-written table (no sink log): compaction is layout-only
    out = str(tmp_path / "m")
    big = [( "a", T0 + dt.timedelta(minutes=i), float(i)) for i in range(40)]
    df = spark.createDataFrame(big, "metric string, ts timestamp, value double")
    (
        df.withColumn("dt", F.to_date("ts")).repartition(8)
        .write.partitionBy("dt").parquet(out)
    )
    part = os.listdir(out)
    part = [p for p in part if p.startswith("dt=")][0]

    assert optimize_metrics_dir(spark, out, min_files=20) == {}  # below threshold
    assert optimize_metrics_dir(spark, out, partitions=["dt=1999-01-01"]) == {}
    report = optimize_metrics_dir(spark, out, min_files=2, partitions=[part])
    assert report[part]["files_before"] == 8 and report[part]["files_after"] == 1
    assert spark.read.parquet(out).count() == 40


def test_resume_replays_crashed_manifest(spark, tmp_path):
    # simulate a crash AFTER the manifest committed but BEFORE the
    # deletes ran: resume must delete the recorded olds so a root read
    # sees exactly the recorded live set
    out = str(tmp_path / "m")
    df = spark.createDataFrame(
        [("a", T0, 1.0), ("a", T0 + dt.timedelta(minutes=1), 2.0)],
        "metric string, ts timestamp, value double",
    )
    (
        df.withColumn("dt", F.to_date("ts")).repartition(2)
        .write.partitionBy("dt").parquet(out)
    )
    files = glob.glob(out + "/dt=*/*.parquet")
    doomed, kept = sorted(files)[0], sorted(files)[1:]
    manifest = {
        "live_files": [[f"file:{p}", os.path.getsize(p), 0] for p in kept],
        "delete_files": [f"file:{doomed}"],
    }
    with open(os.path.join(out, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f)

    assert resume_pending_compaction(spark, out) is True
    assert not os.path.exists(doomed)
    assert not os.path.exists(os.path.join(out, MANIFEST_NAME))
    assert resume_pending_compaction(spark, out) is False  # idempotent


def test_resume_collision_detected_without_fs_checksum(spark, tmp_path):
    """Raw local files carry no Hadoop checksum (getFileChecksum is
    null): the collision guard must fall back to comparing BYTES
    (ADVICE r09 #4) — an equal-length destination with different
    content aborts loudly instead of silently discarding the tmp file;
    an identical destination replays as a completed move."""
    import pytest

    out = str(tmp_path / "m")
    src = os.path.join(out, ".compact_tmp", "part-x.parquet")
    dst = os.path.join(out, "part-x.parquet")
    os.makedirs(os.path.dirname(src))
    with open(src, "wb") as f:
        f.write(b"A" * 64)
    with open(dst, "wb") as f:
        f.write(b"B" * 64)  # same length, different bytes
    manifest = {
        "moves": [[f"file:{src}", f"file:{dst}"]],
        "live_files": [],
        "delete_files": [],
    }
    with open(os.path.join(out, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f)
    with pytest.raises(IOError, match="different content"):
        resume_pending_compaction(spark, out)
    assert os.path.exists(src)  # tmp file never discarded on abort
    assert open(dst, "rb").read() == b"B" * 64  # dst untouched

    # identical bytes: the move already happened on a copy-based FS;
    # replay treats it as done and finishes the cleanup
    with open(dst, "wb") as f:
        f.write(b"A" * 64)
    assert resume_pending_compaction(spark, out) is True
    assert not os.path.exists(os.path.dirname(src))  # tmp dir cleaned
    assert not os.path.exists(os.path.join(out, MANIFEST_NAME))


def test_compact_preserves_a_dotcompact_snapshot_log(spark, tmp_path):
    # a long-lived stream's log contains N.compact snapshots (every 10th
    # batch). Fabricate the documented v1 on-disk form: latest batch is
    # '9.compact' holding the full state; compaction must keep the name
    # (so the restarted stream's compact-interval inference still sees a
    # snapshot at batch 9) while swapping the listed files.
    out = str(tmp_path / "m")
    rows = [("a", T0 + dt.timedelta(minutes=i), float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "metric string, ts timestamp, value double")
    (
        df.withColumn("dt", F.to_date("ts")).repartition(6)
        .write.partitionBy("dt").parquet(out)
    )
    log_dir = os.path.join(out, "_spark_metadata")
    os.makedirs(log_dir)
    entries = [
        json.dumps(
            {
                "path": f"file://{p}",
                "size": os.path.getsize(p),
                "isDir": False,
                "modificationTime": 0,
                "blockReplication": 1,
                "blockSize": 33554432,
                "action": "add",
            }
        )
        for p in sorted(glob.glob(out + "/dt=*/*.parquet"))
    ]
    with open(os.path.join(log_dir, "9.compact"), "w") as f:
        f.write("v1\n" + "\n".join(entries) + "\n")

    assert spark.read.parquet(out).count() == 30  # log is coherent
    report = optimize_metrics_dir(spark, out, min_files=2)
    assert list(report.values())[0]["files_after"] == 1
    names = [n for n in os.listdir(log_dir) if not n.startswith(".")]
    assert names == ["9.compact"]
    assert spark.read.parquet(out).count() == 30  # root read via snapshot


def test_flat_dir_compaction_for_signature_store(spark, tmp_path):
    """The incremental-dedup signature store appends one file set per
    micro-batch (no dt= partitions): compaction must treat the flat
    root as one unit, sort by the leading column, and leave the store
    readable with identical rows — then keep working incrementally."""
    from rearview_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_store_rows,
    )

    store_dir = str(tmp_path / "sigs")
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven",
        "red orange yellow green blue indigo violet",
        "do re mi fa sol la ti",
    ]
    for b, t in enumerate(texts):  # 4 appends -> >= 4 files
        df = spark.createDataFrame([(b, t)], "doc_id long, text string")
        minhash_store_rows(df).coalesce(1).write.mode("append").parquet(store_dir)

    before = glob.glob(store_dir + "/*.parquet")
    assert len(before) >= 4
    rows_before = spark.read.parquet(store_dir).count()

    report = optimize_metrics_dir(spark, store_dir, min_files=2)
    assert report["."]["files_before"] == len(before)
    assert report["."]["files_after"] == 1
    after = glob.glob(store_dir + "/*.parquet")
    assert len(after) == 1 and not set(after) & set(before)
    store = spark.read.parquet(store_dir)
    assert store.count() == rows_before
    # sorted by the leading column (doc_id) -> selective min/max stats
    ids = [r["doc_id"] for r in spark.read.parquet(after[0]).collect()]
    assert ids == sorted(ids)

    # the compacted store still drives incremental dedup
    nxt = spark.createDataFrame(
        [(10, texts[0] + " encore")], "doc_id long, text string"
    )
    out = incremental_minhash_dedup(nxt, store, threshold=0.5).collect()
    assert out[0]["dup_of"] == 0


def test_compaction_tick_compacts_only_closed_partitions(spark, tmp_path):
    """The scheduled cadence: a tick at `now` compacts partitions
    strictly before yesterday and never touches today's (still
    appendable inside the watermark horizon); a retried tick is a
    no-op (compacted partitions fall under min_files)."""
    from rearview_spark.sources.compaction import (
        closed_partitions,
        compaction_tick,
    )

    out = str(tmp_path / "m")
    now = dt.datetime(2024, 1, 3, 6, 0)
    rows = []
    for day in (1, 2, 3):  # Jan 1 (closed), Jan 2 (watermark edge), Jan 3 (today)
        for i in range(24):
            rows.append(("a", dt.datetime(2024, 1, day, i % 24), float(i)))
    df = spark.createDataFrame(rows, "metric string, ts timestamp, value double")
    (
        df.withColumn("dt", F.to_date("ts")).repartition(6)
        .write.partitionBy("dt").parquet(out)
    )

    assert closed_partitions(spark, out, now) == ["dt=2024-01-01"]
    report = compaction_tick(spark, out, now, min_files=2)
    assert set(report) == {"dt=2024-01-01"}
    assert len(glob.glob(out + "/dt=2024-01-01/*.parquet")) == 1
    assert len(glob.glob(out + "/dt=2024-01-03/*.parquet")) > 1  # untouched
    assert compaction_tick(spark, out, now, min_files=2) == {}  # idempotent


def test_resume_completes_pending_moves(spark, tmp_path):
    # crash AFTER the manifest commits but BEFORE any tmp->live move ran:
    # resume must perform the recorded moves, then the log/delete steps —
    # without this, log-less layouts could permanently duplicate rows
    # (review finding r07)
    from rearview_spark.sources.compaction import TMP_DIR_NAME

    out = str(tmp_path / "m")
    os.makedirs(os.path.join(out, TMP_DIR_NAME, "_root"))
    spark.createDataFrame([(1, "x")], "id long, v string").coalesce(1).write.mode(
        "append"
    ).parquet(out)
    old = glob.glob(out + "/*.parquet")[0]
    # the "compacted" replacement sits in tmp, recorded as a pending move
    spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(out, TMP_DIR_NAME, "_root"))
    src = glob.glob(os.path.join(out, TMP_DIR_NAME, "_root", "*.parquet"))[0]
    dst = os.path.join(out, "compacted-" + os.path.basename(src))
    manifest = {
        "moves": [[f"file:{src}", f"file:{dst}"]],
        "live_files": [[f"file:{dst}", os.path.getsize(src), 0]],
        "delete_files": [f"file:{old}"],
    }
    with open(os.path.join(out, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f)

    assert resume_pending_compaction(spark, out) is True
    assert os.path.exists(dst) and not os.path.exists(old)
    assert not os.path.exists(os.path.join(out, TMP_DIR_NAME))
    assert spark.read.parquet(out).count() == 2


def test_concurrent_ingest_tripwire_aborts_before_commit(spark, tmp_path, monkeypatch):
    """r09 guard: a micro-batch committing between compaction planning
    and the manifest write must abort the run CLEANLY — tmp dir gone,
    table bytes and log untouched — instead of rewriting a log that
    erases the new batch."""
    import rearview_spark.sources.compaction as C

    out = str(tmp_path / "m")
    rows = [("a", T0 + dt.timedelta(minutes=i), float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "metric string, ts timestamp, value double")
    (
        df.withColumn("dt", F.to_date("ts")).repartition(6)
        .write.partitionBy("dt").parquet(out)
    )
    log_dir = os.path.join(out, "_spark_metadata")
    os.makedirs(log_dir)
    entries = [
        json.dumps(
            {
                "path": f"file://{p}",
                "size": os.path.getsize(p),
                "isDir": False,
                "modificationTime": 0,
                "blockReplication": 1,
                "blockSize": 33554432,
                "action": "add",
            }
        )
        for p in sorted(glob.glob(out + "/dt=*/*.parquet"))
    ]
    with open(os.path.join(log_dir, "0"), "w") as f:
        f.write("v1\n" + "\n".join(entries) + "\n")
    before_files = sorted(glob.glob(out + "/dt=*/*.parquet"))
    before_log = sorted(os.listdir(log_dir))

    # simulate the race: the sink log advances between the entry
    # snapshot and the pre-commit re-check
    real = C._latest_sink_batch
    calls = {"n": 0}

    def racing(spark_, root):
        calls["n"] += 1
        return real(spark_, root) + (1 if calls["n"] > 1 else 0)

    monkeypatch.setattr(C, "_latest_sink_batch", racing)
    import pytest as _pytest

    with _pytest.raises(IOError, match="concurrent ingest"):
        C.optimize_metrics_dir(spark, out, min_files=2)

    # clean abort: nothing mutated, no tmp or manifest residue
    assert sorted(glob.glob(out + "/dt=*/*.parquet")) == before_files
    assert sorted(os.listdir(log_dir)) == before_log
    assert not os.path.exists(os.path.join(out, C.TMP_DIR_NAME))
    assert not os.path.exists(os.path.join(out, C.MANIFEST_NAME))
    assert spark.read.parquet(out).count() == 30
