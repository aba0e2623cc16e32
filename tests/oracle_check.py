"""Self-check harness mirroring the driver's oracle comparison.

Runs a ``queries()`` entry in Spark and its ``oracle_sql()`` twin in
DuckDB on the same parquet tables, then compares row count, column-name
set, and the order-insensitive multiset of canonicalized values. Floats
are compared **bit-exactly** — the engine's deterministic-aggregate
recipes (decimal sums, no rounding of boundary-prone values) are what
make that bar reachable; if this harness passes, any value-hash scheme
the driver uses will too.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

import duckdb

from dataengineeringpipeline_spark.datalake import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    return v


def canonicalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((v is None, str(v)) for v in r))


def compare_query(spark, name: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty == pass)."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    problems: list[str] = []
    if sql is None:
        if len(srows) == 0:
            problems.append("rows-only check: spark returned 0 rows")
        return problems

    ocols, orows = run_oracle(sql, sf_dir)
    if sorted(scols) != sorted(ocols):
        problems.append(f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}")
        return problems
    if len(srows) != len(orows):
        problems.append(f"row count: spark={len(srows)} oracle={len(orows)}")

    s_canon = canonicalize(scols, [tuple(r) for r in srows])
    o_canon = canonicalize(ocols, orows)
    if s_canon != o_canon:
        diffs = [i for i, (a, b) in enumerate(zip(s_canon, o_canon)) if a != b]
        sample = []
        cols_sorted = sorted(scols)
        for i in diffs[:3]:
            a, b = s_canon[i], o_canon[i]
            cell = [
                (cols_sorted[j], a[j], b[j])
                for j in range(len(a))
                if a[j] != b[j]
            ]
            sample.append(f"row {i}: {cell[:4]}")
        problems.append(
            f"value mismatch in {len(diffs)}/{len(s_canon)} canonical rows; first: {sample}"
        )
    return problems
