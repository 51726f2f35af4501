"""Self-check harness mirroring the driver's correctness gate.

Runs entry(spark) as a smoke check, then every queries()[name] at sf0.01
against oracle_sql()[name] in DuckDB: row count, column names, and an
order-insensitive value hash (rows sorted, columns sorted by name, floats
rounded to 9 significant-ish decimals before hashing).

Usage: python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from gazetteer_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "\0"
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01", only: str | None = None):
    """``only``: comma-separated name prefixes to restrict the run (dev
    loop); the driver always runs the full set."""
    spark = get_spark("correctness_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    print("== entry() smoke ==", flush=True)
    t0 = time.time()
    edf = entrymod.entry(spark)
    erows = edf.collect()
    print(f"entry: {len(erows)} rows, schema={edf.schema.simpleString()}, "
          f"{time.time()-t0:.1f}s", flush=True)
    assert len(erows) >= 0

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    fails = []
    n_run = 0
    for name, fn in qs.items():
        if only and not any(name.startswith(p) for p in only.split(",")):
            continue
        n_run += 1
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        stime = time.time() - t0
        rec = {"rows": len(srows), "cols": scols, "sec": round(stime, 2)}
        if name in oracles:
            orel = con.execute(oracles[name])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
            ok_count = len(srows) == len(orows)
            ok_cols = sorted(scols) == sorted(ocols)
            sh = value_hash(srows, scols)
            oh = value_hash(orows, ocols)
            ok_hash = sh == oh
            rec.update(
                oracle_rows=len(orows), count_match=ok_count,
                schema_match=ok_cols, hash_match=ok_hash,
            )
            if not (ok_count and ok_cols and ok_hash):
                fails.append(name)
                # dump small diff sample
                sset = {tuple(map(_norm, r)) for r in srows}
                oset = {tuple(map(_norm, r)) for r in orows}
                rec["spark_only_sample"] = list(sset - oset)[:3]
                rec["oracle_only_sample"] = list(oset - sset)[:3]
        else:
            rec["oracle"] = "rows-only"
        results[name] = rec
        status = "FAIL" if name in fails else "ok"
        print(f"[{status}] {name}: {json.dumps(rec, default=str)[:400]}", flush=True)

    print(json.dumps({"fails": fails, "n": n_run}))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
