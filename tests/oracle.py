"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet files, then compares row count, column names, and values
(column-name-sorted, row-sorted, floats normalized) — a stricter local
gate than the driver's hash so failures are debuggable.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries round to 6dp already; format canonically
        return format(v, ".6f")
    if isinstance(v, (list, tuple)) or v.__class__.__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    dd = duck_run(oracle_sql, sf_dir)
    if sorted(sp.columns) != sorted(dd.columns):
        return False, f"columns differ: spark={sorted(sp.columns)} duck={sorted(dd.columns)}"
    if len(sp) != len(dd):
        return False, f"row count differs: spark={len(sp)} duck={len(dd)}"
    a, b = normalize(sp), normalize(dd)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return False, f"row {i} differs:\n  spark={ra}\n  duck ={rb}"
    return True, "ok"
