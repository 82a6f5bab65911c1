"""Structured Streaming ingest: events -> the tall `metrics` table.

The reference *pulls* pre-indexed series from Graphite on each cron firing
(README.md:6 — Graphite is the system of record; SURVEY.md §1.4). Our
engine owns the store, so ingest is a streaming inversion of that
contract (BASELINE.json spark_approach: "Structured Streaming for ingest
+ DataFrame queries for monitoring dashboards"):

    readStream(events) -> map to (metric, ts, value)
      -> withWatermark(ts, delay)          # S9: bounded out-of-orderness
      -> writeStream partitioned by date   # the batch G-layer reads this

Batch/stream unification: the transform is the SAME
``events_as_timeseries`` projection the batch path uses; monitors then
read closed windows from the table. File-source streaming is what the
test container supports; on a cluster the source line changes to Kafka
and nothing else does.

Scale: the sink partitions by ``date(ts)`` — the layout that gives the
batch window fetch (G4) partition pruning, and bounds any late-data
rewrite to one day's partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, source_dir: str, max_files_per_trigger: int = 10) -> DataFrame:
    """File-source event stream (schema pinned — streaming requires it)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def to_metrics(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """events -> canonical tall series with a watermark bound (S9)."""
    return (
        events.select(
            F.col("event_type").alias("metric"),
            "ts",
            F.col("value").cast("double").alias("value"),
        )
        .withWatermark("ts", watermark)
    )


def ingest_to_metrics(
    spark: SparkSession,
    source_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
) -> StreamingQuery:
    """Start the ingest stream writing the date-partitioned metrics table.
    Exactly-once per file via the checkpoint (file source + parquet sink)."""
    metrics = to_metrics(events_stream(spark, source_dir), watermark)
    return (
        metrics.withColumn("dt", F.to_date("ts"))
        .writeStream.format("parquet")
        .option("path", metrics_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("dt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Reader options for the cluster ingest source. Factored out of the
    builder so the plumbing is unit-testable without a broker or the
    kafka connector jar (not in this container). ``maxOffsetsPerTrigger``
    is the streaming analogue of ``maxFilesPerTrigger`` — it bounds
    micro-batch size so one trigger's state fits the executors."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # at 100 TB a compacted/expired offset must not kill the query;
        # the dedup_stream + checkpoint make reprocessing safe
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def parse_kafka_events(raw: DataFrame) -> DataFrame:
    """Kafka wire format -> EVENTS_SCHEMA rows.

    ``raw`` carries the fixed Kafka source schema (key/value binary,
    topic, partition, offset, timestamp). The event is a JSON document in
    ``value``; rows whose payload fails to parse surface as all-null
    events rather than failing the batch (filter on ``event_id IS NOT
    NULL`` downstream to drop them). ``ts`` falls back to the broker
    timestamp when the payload omits it — late-data handling then still
    has a watermarkable column."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), EVENTS_SCHEMA).alias("e"),
        F.col("timestamp").alias("_broker_ts"),
    )
    return parsed.select(
        F.col("e.event_id").alias("event_id"),
        F.coalesce(F.col("e.ts"), F.col("_broker_ts")).alias("ts"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
        F.col("e.props").alias("props"),
    )


def kafka_events_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Cluster variant of :func:`events_stream`: same EVENTS_SCHEMA
    contract, Kafka source. ``to_metrics`` / ``dedup_stream`` /
    ``ingest_to_metrics`` compose unchanged — the source line is the ONLY
    difference between the container and cluster deployments (needs the
    spark-sql-kafka connector on the cluster classpath)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(
        bootstrap_servers, topic, starting_offsets,
        max_offsets_per_trigger, fail_on_data_loss,
    ).items():
        reader = reader.option(k, v)
    return parse_kafka_events(reader.load())


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Exactly-once event ingest under at-least-once delivery: watermarked
    ``dropDuplicates`` on the event key. State holds one entry per
    event_id only until the watermark passes its timestamp — bounded
    state, the streaming form of the exact-dedup operator
    (operators/dedup.py). A replayed/duplicate event inside the watermark
    horizon is dropped; beyond the horizon the upstream source's own
    exactly-once guarantee (e.g. Kafka offsets) takes over."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id", "ts"])
