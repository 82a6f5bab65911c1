"""Environment verification — the reference's visible test strategy.

Rearview ships no unit tests in the shell repo; what it ships is
environment verification: ``rake rearview:config:verify`` (README.md:58)
checks the app config, and ``sandbox/verify_sandbox.rb:15-22`` smoke-tests
that the isolated MRI interpreter execs with the right gems/ENV/load
path. This module is the Spark analogue: each check exercises one
boundary a monitor run crosses (SURVEY.md §3.1), and the pandas-UDF
worker check is the direct counterpart of verify_sandbox.rb — it proves
the separate-OS-process evaluation boundary works end to end.

Run: ``python -m rearview_spark.verify_env [sf_dir]`` — prints one JSON
object, exit code 0 iff every check passes.
"""

from __future__ import annotations

import json
import os
import sys


def verify(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    checks: dict[str, str] = {}

    def check(name: str, fn) -> None:
        try:
            fn()
            checks[name] = "ok"
        except Exception as e:  # noqa: BLE001 — report, don't raise
            checks[name] = f"FAIL: {type(e).__name__}: {e}"

    spark_box = {}

    def _session():
        from rearview_spark.session import get_spark

        spark = get_spark("verify_env")
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        spark_box["spark"] = spark

    def _java():
        assert os.environ.get("JAVA_HOME"), "JAVA_HOME not set"

    def _testdata():
        from rearview_spark.sources.loader import Tables

        t = Tables(spark_box["spark"], sf_dir)
        assert t.lineitem.limit(1).count() == 1
        assert t.events.limit(1).count() == 1  # nanos-ts read path

    def _udf_worker():
        # ≙ sandbox/verify_sandbox.rb: prove the out-of-process evaluation
        # boundary (JVM -> Python worker over Arrow) round-trips
        from pyspark.sql import functions as F

        spark = spark_box["spark"]
        df = spark.range(4).withColumn("g", F.col("id") % 2).groupBy("g")

        def f(pdf):
            return pdf.assign(n=len(pdf))

        out = df.applyInPandas(f, "id bigint, g bigint, n bigint").collect()
        assert len(out) == 4 and all(r["n"] == 2 for r in out)

    def _oracle_engine():
        import duckdb

        assert duckdb.sql("SELECT 1 + 1").fetchone()[0] == 2

    def _cron():
        from rearview_spark.monitors.cron import next_fire
        import datetime as dt

        nxt = next_fire("*/5 * * * *", dt.datetime(2024, 1, 1, 0, 1))
        assert nxt == dt.datetime(2024, 1, 1, 0, 5)

    check("session_config", _session)
    check("java_home", _java)
    check("testdata_readable", _testdata)
    check("pandas_udf_worker", _udf_worker)
    check("oracle_engine", _oracle_engine)
    check("cron_parser", _cron)
    return {"ok": all(v == "ok" for v in checks.values()), "checks": checks}


if __name__ == "__main__":
    report = verify(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
    print(json.dumps(report, indent=2))
    sys.exit(0 if report["ok"] else 1)
