"""Mirror of the driver's correctness gate: run every queries() entry on
Spark at sf0.01 and its oracle_sql() on DuckDB; compare row count, sorted
column names, and an order-insensitive value hash (floats canonicalized to
9 significant digits, NaN/None normalized).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import __spark_entry__ as E
    from char_ner_spark.session import build_session

    spark = build_session("check_contract", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name:38s} spark error: {str(ex).splitlines()[0][:150]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name:38s} rows={len(srows):7d} cols={sorted(scols)} ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name:38s} duckdb error: {str(ex).splitlines()[0][:150]}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            hs, hd = table_hash(scols, srows), table_hash(dcols, drows)
            if hs != hd:
                problems.append(f"value-hash {hs} != {hd}")
                # show a sample diff
                ss = {tuple(canon_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows}
                dd = {tuple(canon_cell(r[i]) for i in sorted(range(len(dcols)), key=lambda i: dcols[i])) for r in drows}
                so, do = list(ss - dd)[:2], list(dd - ss)[:2]
                if so:
                    problems.append(f"spark-only sample: {so}")
                if do:
                    problems.append(f"duck-only sample: {do}")
        if problems:
            print(f"FAIL  {name:38s} {'; '.join(str(p) for p in problems)}")
            failures.append(name)
        else:
            print(f"OK    {name:38s} rows={len(srows):7d} ({time.time()-t0:.1f}s)")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
