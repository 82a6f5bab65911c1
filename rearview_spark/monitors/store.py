"""Parquet-backed persistence for the monitor tables.

The reference persists through ActiveRecord into MySQL/Postgres
(config/database.yml:1-20): job_data appends (db/schema.rb:29-36),
job_errors insert/update (:38-48), jobs.status/next_run updates (:55-62).
Our store keeps the same tables as parquet directories. In production the
mutable tables (monitors state, job_errors) would be Delta with MERGE
(exactly-once via idempotent merge on (job_id, scheduled_ts), SURVEY.md
§4.2 #4); Delta jars aren't in this container, so mutation is
read-modify-write-swap — correct single-writer semantics, which matches
the reference (one scheduler process owns these tables; the DATA path
never mutates).

Config tables are dimension-scale: full rewrite per tick is bounded and
cheap; the append-only job_data table is partitioned by run date so
dashboard reads prune.
"""

from __future__ import annotations

import datetime as dt
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from rearview_spark.monitors import schemas


class JobStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- generic helpers ----------------------------------------------------

    def _path(self, table: str) -> Path:
        return self.root / table

    def _exists(self, table: str) -> bool:
        p = self._path(table)
        return p.exists() and any(p.iterdir())

    def read(self, table: str) -> DataFrame:
        schema = {
            "monitors": schemas.MONITORS,
            "job_data": schemas.JOB_DATA,
            "job_errors": schemas.JOB_ERRORS,
            "applications": schemas.APPLICATIONS,
            "users": schemas.USERS,
        }[table]
        if not self._exists(table):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(str(self._path(table)))

    def append(self, table: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(str(self._path(table)))

    def overwrite(self, table: str, df: DataFrame) -> None:
        """Atomic-ish swap: write to a side dir, then rename over. The
        single-writer scheduler is the only mutator (reference model)."""
        tmp = self.root / f".{table}.{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(str(tmp))
        dest = self._path(table)
        if dest.exists():
            shutil.rmtree(dest)
        tmp.rename(dest)

    # -- typed operations ---------------------------------------------------

    def save_monitors(self, df: DataFrame) -> None:
        self.overwrite("monitors", df)

    def append_job_data(self, run_results: DataFrame, now: dt.datetime) -> None:
        """Materialize run results as job_data rows (R12/S8)."""
        from pyspark.sql import functions as F

        rows = run_results.select(
            F.monotonically_increasing_id().alias("id"),
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
