"""Local replica of the driver's oracle compare: run a registered Spark
query and its DuckDB oracle on the same parquet dir, compare row count,
column names, and an order-insensitive value hash (values stringified,
rows sorted, columns sorted by name).

Stricter than the driver in two ways (round-1 lessons):

* any DECIMAL/HUGEINT output column is itself a failure — the driver
  hashes those types asymmetrically between engines even when values are
  identical (8 round-1 hash_match failures, all value-equal). Emitting
  ROUND(CAST(x AS DOUBLE), n) / BIGINT on both sides is the contract.
* a 0-row result is a failure — it proves nothing (two round-1 queries
  passed vacuously)."""

from __future__ import annotations

import decimal
import hashlib
import math
import os

import duckdb


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def rows_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    rel = con.sql(sql)
    cols = list(rel.columns)
    # type name per output column (e.g. 'DECIMAL(18,2)', 'HUGEINT')
    types = [str(t) for t in rel.types]
    rows = rel.fetchall()
    con.close()
    return cols, rows, types


def compare(spark, name: str, fn, sql: str, sf_dir: str,
            allow_empty: bool = False):
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows, d_types = run_oracle(sql, sf_dir)
    problems = []
    # driver-hash-unsafe output types (value-identical results still fail
    # the driver's hash when one side is DECIMAL/HUGEINT)
    for f_ in sdf.schema.fields:
        if f_.dataType.typeName() == "decimal":
            problems.append(f"spark output column {f_.name} is DecimalType")
    for c, t in zip(d_cols, d_types):
        if "DECIMAL" in t.upper() or "HUGEINT" in t.upper():
            problems.append(f"duckdb output column {c} is {t}")
    if not s_rows and not allow_empty:
        problems.append("vacuous: 0 rows on both engines proves nothing")
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
    if sorted(s_cols) != sorted(c.lower() for c in d_cols) and sorted(
        c.lower() for c in s_cols
    ) != sorted(c.lower() for c in d_cols):
        problems.append(f"columns spark={s_cols} duckdb={d_cols}")
    hs = rows_digest(s_cols, s_rows)
    hd = rows_digest([c.lower() for c in d_cols], d_rows)
    if hs != hd:
        problems.append("value-hash mismatch")
        # surface a few differing lines for debugging
        order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i].lower())
        ls = sorted("|".join(_norm(r[i]) for i in order_s) for r in s_rows)
        ld = sorted("|".join(_norm(r[i]) for i in order_d) for r in d_rows)
        diff = [
            (a, b) for a, b in zip(ls, ld) if a != b
        ][:3]
        for a, b in diff:
            problems.append(f"  spark: {a}")
            problems.append(f"  duck : {b}")
        if len(ls) != len(ld):
            problems.append(f"  (lens {len(ls)} vs {len(ld)})")
    return problems
