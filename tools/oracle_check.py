"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir,
compare row counts + column names + values (order-insensitive).

Usage: python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from rearview_spark.session import get_spark
from rearview_spark.sources.loader import TABLE_NAMES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        problems.append(f"columns: spark={scols} duck={dcols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            sa = pd.to_numeric(sv, errors="coerce")
            da = pd.to_numeric(dv, errors="coerce")
            mismatch = ~(
                (sa.isna() & da.isna())
                | ((sa - da).abs() <= 1e-9 + 1e-9 * da.abs())
            )
        else:
            mismatch = ~((sv.isna() & dv.isna()) | (sv == dv))
        n_bad = int(mismatch.sum())
        if n_bad:
            i = mismatch.idxmax()
            problems.append(
                f"col {c}: {n_bad} mismatches, first at row {i}: spark={sv[i]!r} duck={dv[i]!r}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from rearview_spark.plans import all_queries

    spark = get_spark("oracle_check")
    con = duck_con(sf_dir)

    failed = []
    for name, spec in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            sdf = spec["fn"](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if not spec.get("oracle"):
            print(f"skip  {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            ddf = con.execute(spec["oracle"]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0]}")
            failed.append(name)
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok    {name} ({len(sdf)} rows)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
