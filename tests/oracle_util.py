"""Local stand-in for the driver's DuckDB oracle comparison.

Runs a Spark query and its oracle SQL side-by-side and compares:
row count, sorted column names, and an order-insensitive multiset of
normalized values (floats rounded, timestamps ISO-formatted) — the
same contract described in __spark_entry__.py's docstring.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # final guard: queries already round; this absorbs repr noise
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def compare(spark, sf_dir: str, query_fn, oracle: str):
    sdf = query_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb_con(sf_dir)
    res = con.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()

    assert sorted(scols) == sorted(dcols), f"columns differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"row count {len(srows)} vs oracle {len(drows)}"
    s_set = _rowset(srows, scols)
    d_set = _rowset(drows, dcols)
    mismatches = [
        (a, b) for a, b in zip(s_set, d_set) if a != b
    ]
    assert not mismatches, f"{len(mismatches)} value mismatches; first 3: {mismatches[:3]}"
    return len(srows)
