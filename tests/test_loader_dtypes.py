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


# --- Kafka source plumbing (no broker in the sandbox) -----------------------


def test_kafka_reader_options_translation():
    """Engine knobs -> Kafka source options, including the degrade-don't-
    die failOnDataLoss default and the backpressure bound."""
    from rearview_spark.sources.loader import kafka_reader_options

    opts = kafka_reader_options("b1:9092,b2:9092", "events")
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "events",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }
    opts = kafka_reader_options(
        "b:9092", "ev", starting_offsets="latest",
        max_offsets_per_trigger=50_000, fail_on_data_loss=True,
    )
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "50000"
    assert opts["failOnDataLoss"] == "true"


def test_kafka_value_decode_matches_file_source(spark, tmp_path):
    """parse_kafka_events over Kafka's fixed record shape must land the
    IDENTICAL frame (schema and values, micros preserved) as the file
    source reading the same events — the contract that lets standing
    queries swap sources without change. Includes a poison-pill record
    (malformed JSON -> null columns, stream survives)."""
    import json

    from rearview_spark.sources.loader import parse_kafka_events

    sf_dir = _write_events(tmp_path, "micros")
    batch = load_table(spark, sf_dir, "events")

    def wire(row):
        d = row.asDict()
        d["ts"] = int(
            d["ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
        )
        return json.dumps(d).encode()

    kafka_rows = [
        (None, wire(r), "events", 0, i, dt.datetime(2024, 3, 3), 0)
        for i, r in enumerate(batch.collect())
    ] + [(None, b"{not json", "events", 0, 99, dt.datetime(2024, 3, 3), 0)]
    raw = spark.createDataFrame(
        kafka_rows,
        "key binary, value binary, topic string, partition int, offset long,"
        " timestamp timestamp, timestampType int",
    )
    decoded = parse_kafka_events(raw)
    assert [f.simpleString() for f in decoded.schema.fields] == [
        f.simpleString() for f in batch.schema.fields
    ]
    good = decoded.filter("event_id IS NOT NULL")
    assert sorted(map(tuple, good.collect())) == sorted(map(tuple, batch.collect()))
    # the poison pill degraded to nulls instead of failing the stream
    assert decoded.count() == batch.count() + 1


def test_kafka_stream_builder_requires_connector(spark):
    """load_events_stream_kafka wires format('kafka') + options; without
    the connector jar the source lookup fails by NAME — proving the
    branch reaches Kafka's DataSource resolution, not some silent
    fallback. (With the jar present this builds a streaming frame whose
    schema parse_kafka_events consumes — covered by the decode test.)"""
    from rearview_spark.sources.loader import load_events_stream_kafka

    try:
        df = load_events_stream_kafka(spark, "b:9092", "events")
    except Exception as e:  # noqa: BLE001 — expected without the jar
        assert "kafka" in str(e).lower()
    else:  # pragma: no cover - only when a connector jar is present
        assert df.isStreaming and "event_id" in df.columns
