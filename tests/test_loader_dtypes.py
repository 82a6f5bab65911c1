"""Regression pins for the events source's physical ts encodings.

The driver's testdata has shipped events.ts as parquet TIMESTAMP(NANOS)
(rounds 1-2) and TIMESTAMP(MICROS, isAdjustedToUTC=0) (round 3) — the
round-3 loader assumed NANOS and 22 gate queries went red. These tests
write tiny fixtures in BOTH encodings (plus bare int64 epoch-nanos) and
assert the batch loader and the streaming reader land the identical frame
for each, so a future encoding flip is a test failure here, not a
driver-visible regression.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rearview_spark.sources.loader import (
    events_ts_is_nanos,
    load_events_stream,
    load_table,
)

# micros-precision wall-clock instants (naive; the engine session tz is UTC)
_TS = [
    dt.datetime(2024, 3, 1, 0, 0, 0, 1),
    dt.datetime(2024, 3, 1, 12, 30, 45, 123456),
    dt.datetime(2024, 3, 2, 23, 59, 59, 999999),
]
_ROWS = {
    "event_id": [1, 2, 3],
    "user_id": [10, 20, 30],
    "event_type": ["view", "click", "purchase"],
    "value": [1.5, 2.5, 3.5],
    "props": ['{"a":1}', "{}", '{"b":2}'],
}


def _write_events(tmp_path, encoding: str) -> str:
    """Write events.parquet with ts in the given physical encoding."""
    if encoding == "micros":
        ts = pa.array(_TS, type=pa.timestamp("us"))
    elif encoding == "nanos":
        ts = pa.array(_TS, type=pa.timestamp("ns"))
    elif encoding == "int64_nanos":
        ts = pa.array(
            [int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) * 1000 for t in _TS],
            type=pa.int64(),
        )
    else:  # pragma: no cover
        raise ValueError(encoding)
    table = pa.table(
        {
            "event_id": pa.array(_ROWS["event_id"], pa.int64()),
            "ts": ts,
            "user_id": pa.array(_ROWS["user_id"], pa.int64()),
            "event_type": pa.array(_ROWS["event_type"], pa.string()),
            "value": pa.array(_ROWS["value"], pa.float64()),
            "props": pa.array(_ROWS["props"], pa.string()),
        }
    )
    d = tmp_path / f"enc_{encoding}"
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("encoding", ["micros", "nanos", "int64_nanos"])
def test_batch_loader_lands_identical_frame(spark, tmp_path, encoding):
    sf_dir = _write_events(tmp_path, encoding)
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    rows = sorted(df.select("event_id", "ts", "value").collect())
    assert [r["ts"] for r in rows] == _TS
    assert [r["event_id"] for r in rows] == [1, 2, 3]


def test_footer_sniffer_branches():
    # covered implicitly above; pin the predicate itself on real testdata
    assert events_ts_is_nanos.__doc__  # exists
    import pathlib

    current = pathlib.Path("/root/testdata/sf0.001/events.parquet")
    if current.exists():
        # whatever the driver ships, the sniffer must not raise
        events_ts_is_nanos(str(current))


@pytest.mark.parametrize("encoding", ["micros", "nanos"])
def test_stream_reader_matches_batch(spark, tmp_path, encoding):
    sf_dir = _write_events(tmp_path, encoding)
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    try:
        stream = load_events_stream(spark, sf_dir)
        assert stream.isStreaming
        name = f"loader_dtype_{encoding}"
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(
            spark.table(name).select("event_id", "ts", "value").collect()
        )
        want = sorted(
            load_table(spark, sf_dir, "events")
            .select("event_id", "ts", "value")
            .collect()
        )
        assert got == want
        assert [r["ts"] for r in got] == _TS
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)


def test_int64_micros_rejected_loudly(tmp_path):
    """A bare-int64 ts whose magnitude is epoch-MICROS must raise, not be
    silently misread 1000x off (ADVICE r04 #3)."""
    ts = pa.array(
        [int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for t in _TS],
        type=pa.int64(),
    )
    table = pa.table({"event_id": pa.array([1, 2, 3], pa.int64()), "ts": ts})
    d = tmp_path / "enc_int64_micros"
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    with pytest.raises(ValueError, match="epoch-nanos"):
        events_ts_is_nanos(str(d / "events.parquet"))


def test_empty_directory_raises_descriptive(tmp_path):
    d = tmp_path / "empty_events.parquet"
    d.mkdir()
    with pytest.raises(FileNotFoundError, match="no \\*\\.parquet part files"):
        events_ts_is_nanos(str(d))


def test_sniff_memoized_per_path(tmp_path, monkeypatch):
    """Second sniff of the same path must not touch the footer again
    (per-query overhead fix, VERDICT r04 'What's wrong' #2)."""
    from rearview_spark.sources import loader

    sf_dir = _write_events(tmp_path, "micros")
    path = f"{sf_dir}/events.parquet"
    loader.reset_sniff_cache()
    assert events_ts_is_nanos(path) is False

    def _boom(*a, **k):  # pragma: no cover - called only on cache miss
        raise AssertionError("footer re-read after memoization")

    monkeypatch.setattr(pq, "read_schema", _boom)
    assert events_ts_is_nanos(path) is False
    loader.reset_sniff_cache()
