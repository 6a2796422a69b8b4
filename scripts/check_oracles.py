"""Replicates the driver's correctness gate locally: runs every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables, compares row count, column names, and an
order-insensitive value hash.

Usage: python scripts/check_oracles.py [--out FILE.json] [sf_dir] [query ...]

``--out``: additionally write the results as a driver-format JSON
artifact ({name: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}) — used to self-record the FULL 59-query run each
round (the driver's own artifact enumerates at most 50 entries; see
the note on _QUERIES in __spark_entry__.py).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from pycrawler_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    """Order-insensitive canonical hash: sort columns by name, stringify
    values with float rounding, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        import decimal

        if v is None:
            return "\\N"
        if isinstance(v, (float, decimal.Decimal)):
            return f"{float(v):.9g}"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    lines = sorted("\x01".join(cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        if i + 1 >= len(args):
            print("usage: check_oracles.py [--out FILE.json] [sf_dir] [query ...]")
            return 2
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    # default = sf0.01, the scale the DRIVER oracles at: q_ann_ivf's
    # oracle inlines a quantizer fitted on sf0.01 data (similarity.
    # ivf_fit_local), so that query is only oracle-comparable there
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    report: dict = {}
    spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_skip = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"spark: {str(e)[:200]}"}
            n_fail += 1
            continue
        if name not in oracles:
            ok = len(srows) >= 0
            print(f"SKIP {name}: rows-only ({len(srows)} rows, "
                  f"{time.monotonic()-t0:.1f}s)")
            report[name] = {"rows_match": ok, "schema_match": None,
                            "hash_match": None, "spark_rows": len(srows),
                            "oracle_rows": None, "err": "no_oracle"}
            n_skip += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(srows),
                            "oracle_rows": None,
                            "err": f"duckdb: {str(e)[:200]}"}
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            hs = canon([tuple(r) for r in srows], scols)
            hd = canon(drows, dcols)
            if hs != hd:
                problems.append("value-hash mismatch")
                # show a few differing rows for debugging
                ss = {tuple(str(x) for x in r) for r in srows}
                ds = {tuple(str(x) for x in r) for r in drows}
                for d in list(ss - ds)[:2]:
                    problems.append(f"  spark-only: {d}")
                for d in list(ds - ss)[:2]:
                    problems.append(f"  duck-only:  {d}")
        report[name] = {
            "rows_match": len(srows) == len(drows),
            "schema_match": sorted(scols) == sorted(dcols),
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "err": "; ".join(problems) if problems else None,
        }
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.monotonic()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {out_path} ({len(report)} entries)")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
