"""Local replica of the driver's DuckDB-oracle comparison.

For each ``queries()`` entry with an ``oracle_sql()`` twin: run both at the
given sf dir, sort columns by name, canonicalize values, compare as
order-insensitive multisets. Used by tests and by ad-hoc dev runs.
"""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and normalize float text
        if v == 0:
            v = 0.0
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v)
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s.replace("+00:00", "")
    return str(v)


def df_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_canon(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def compare(spark, name: str, qfn, sql: str, sf_dir: str) -> dict:
    sdf = qfn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(sql, sf_dir)
    sc, sm = df_to_multiset(s_cols, s_rows)
    oc, om = df_to_multiset(o_cols, o_rows)
    result = {
        "name": name,
        "spark_rows": len(sm),
        "oracle_rows": len(om),
        "cols_match": sc == oc,
        "values_match": sm == om,
        "spark_cols": sc,
        "oracle_cols": oc,
    }
    if not result["values_match"] and result["cols_match"]:
        diff_s = [r for r in sm if r not in set(om)][:3]
        diff_o = [r for r in om if r not in set(sm)][:3]
        result["spark_only"] = diff_s
        result["oracle_only"] = diff_o
    return result
