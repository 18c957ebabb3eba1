"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side-by-side, normalizes both result
sets (sort columns by name, stringify, sort rows) and diffs them — the same
shape of check the driver records into CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v) -> str:
    import numpy as np

    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, np.generic):
        v = v.item()
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if not isinstance(v, (list, tuple, dict)) and pd.isna(v):
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    sp = spark_df.toPandas()
    du = con.execute(sql).df()
    out = {
        "rows_spark": len(sp),
        "rows_duck": len(du),
        "cols_spark": sorted(sp.columns),
        "cols_duck": sorted(du.columns),
        "match": False,
        "first_diff": None,
    }
    if sorted(sp.columns) != sorted(du.columns):
        out["first_diff"] = "column names differ"
        return out
    a, b = normalize(sp), normalize(du)
    if len(a) != len(b):
        out["first_diff"] = f"row counts {len(a)} vs {len(b)}"
        return out
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            out["first_diff"] = f"row {i}: spark={ra} duck={rb}"
            return out
    out["match"] = True
    return out
