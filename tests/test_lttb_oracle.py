"""Pre-registration parity test for the staged LTTB gate
(plans/timeseries_queries.py PENDING_QUERIES): runs the Spark query and
its DuckDB oracle through the same comparison the driver/oracle_check
use, so when round 7 flips the entry into QUERIES it is already known
green at gate scale."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_lttb_pending_gate_matches_oracle(spark):
    import oracle_check as oc

    from rearview_spark.plans.timeseries_queries import PENDING_QUERIES

    spec = PENDING_QUERIES["ts_lttb_downsample"]
    sf_dir = "/root/testdata/sf0.01"
    sdf = spec["fn"](spark, sf_dir).toPandas()
    con = oc.duck_con(sf_dir)
    ddf = con.execute(spec["oracle"]).fetchdf()
    problems = oc.compare("ts_lttb_downsample", sdf, ddf)
    assert not problems, problems
    # decimation actually happened: 20 points per big series
    assert 0 < len(sdf) < 3385
