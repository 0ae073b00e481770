"""Local replica of the driver's correctness gate: run each
__spark_entry__ query in Spark and its oracle in DuckDB, compare
row-count + column names + order-insensitive values exactly."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_one(spark, con, name: str, qfn, sql: str, sf_dir: str) -> dict:
    sdf = qfn(spark, sf_dir).toPandas()
    odf = con.execute(sql).fetchdf()
    out = {"name": name, "spark_rows": len(sdf), "oracle_rows": len(odf)}
    if sorted(sdf.columns) != sorted(odf.columns):
        out["status"] = "SCHEMA_MISMATCH"
        out["spark_cols"] = sorted(sdf.columns)
        out["oracle_cols"] = sorted(odf.columns)
        return out
    if len(sdf) != len(odf):
        out["status"] = "ROWCOUNT_MISMATCH"
        return out
    a, b = normalize(sdf), normalize(odf)
    # The driver hashes rendered values, so int64 3 vs float64 3.0 is a
    # hash MISMATCH even though check_dtype=False would pass it (DuckDB
    # HUGEINT sums surface as float64 in pandas). Reproduce that verdict.
    kind_diff = [
        c for c in a.columns
        if {a[c].dtype.kind, b[c].dtype.kind} == {"i", "f"}
    ]
    if kind_diff:
        out["status"] = "VALUE_MISMATCH"
        out["detail"] = [f"int-vs-float dtype kind mismatch: {kind_diff}"]
        return out
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        out["status"] = "OK"
    except AssertionError as e:
        out["status"] = "VALUE_MISMATCH"
        out["detail"] = str(e).split("\n")[0:6]
        # show first diff row for debugging
        neq = (a != b).any(axis=1)
        if neq.any():
            i = int(neq.idxmax())
            out["first_diff"] = {"row": i, "spark": a.iloc[i].to_dict(), "oracle": b.iloc[i].to_dict()}
    return out
