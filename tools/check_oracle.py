"""Local replica of the driver's correctness gate.

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, compares row count, column names, and an
order-insensitive value multiset (cells normalized to strings, floats
rounded upstream by the queries themselves).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


_TYPE_ALIASES = {
    "long": "int64", "bigint": "int64", "int": "int32", "integer": "int32",
    "double": "float64", "float": "float32", "string": "string",
    "large_string": "string", "boolean": "bool",
}


def _norm_type(t: str) -> str:
    t = t.strip().lower()
    if t.startswith("decimal"):
        # Spark "decimal(38,0)" and Arrow "decimal128(38, 0)" are the same
        # physical decimal128 — canonicalize to decimal(p,s)
        import re as _re
        m = _re.match(r"decimal\d*\((\d+),\s*(-?\d+)\)", t)
        return f"decimal({m.group(1)},{m.group(2)})" if m else "decimal"
    if t.startswith("array<") or t.startswith("list<") or t.startswith("list("):
        return "list"
    if t.startswith("map") or t.startswith("struct"):
        return t.split("<")[0].split("(")[0]
    if t.startswith("date"):
        return "date"
    if t.startswith("timestamp"):
        return "timestamp"
    return _TYPE_ALIASES.get(t, t)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from json_spark.session import get_spark

    # SPARK_GRAFT_TZ simulates the driver's arbitrary session timezone
    # (the external verify may not run UTC — queries must be TZ-invariant)
    tz = os.environ.get("SPARK_GRAFT_TZ")
    extra = {"spark.sql.session.timeZone": tz} if tz else None
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8,
                      extra_conf=extra)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            status = f"rows-only ({len(srows)} rows)"
            print(f"  {name:28s} {status}")
            continue
        dres = con.execute(oracles[name])
        dcols = [d[0] for d in dres.description]
        drows = dres.fetchall()
        # type parity: the driver's value hash distinguishes physical types
        # (e.g. DuckDB HUGEINT→decimal128 vs Spark bigint), which the string
        # normalization below cannot see — compare normalized type names too.
        dtypes = {f.name: _norm_type(str(f.type))
                  for f in con.execute(oracles[name]).fetch_arrow_table().schema}
        stypes = {c: _norm_type(t) for c, t in sdf.dtypes}
        ok_types = all(stypes.get(c) == dtypes.get(c) for c in scols)
        if not ok_types:
            diff = {c: (stypes.get(c), dtypes.get(c))
                    for c in scols if stypes.get(c) != dtypes.get(c)}
            print(f"  {name:28s} TYPE-MISMATCH {diff}")
            failures.append(name)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = ok_cols and norm_rows(scols, srows) == norm_rows(dcols, drows)
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(f"  {name:28s} {status}  spark={len(srows)} duck={len(drows)} "
              f"cols={'=' if ok_cols else f'{scols} vs {dcols}'}")
        if status == "FAIL":
            failures.append(name)
            if ok_cols:
                s, d = norm_rows(scols, srows), norm_rows(dcols, drows)
                only_s = list((s - d).items())[:3]
                only_d = list((d - s).items())[:3]
                print(f"    spark-only: {only_s}")
                print(f"    duck-only:  {only_d}")
    if failures:
        print(f"\nFAILED: {failures}")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
