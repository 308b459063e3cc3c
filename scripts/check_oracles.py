"""Local twin of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same
parquet tables; compare row count, column names, and an
order-insensitive value hash (cells stringified, floats via '%.6g' —
both engines' float outputs are already rounded to 6 dp inside the
queries themselves, so the gate compares at the contract precision,
rows sorted)."""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"create view {t} as select * from '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = sys.argv[1:]
    unknown = sorted(set(only) - set(queries))
    if unknown:
        # a typo'd name would otherwise filter out EVERYTHING and the
        # gate would print ALL OK having checked nothing
        raise SystemExit(f"unknown query name(s): {unknown}; "
                         f"available: {sorted(queries)}")
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"spark error: {str(e)[:300]}"))
            print(f"{name:20s} SPARK-ERROR {str(e)[:160]}")
            continue
        if name not in oracles:
            print(f"{name:20s} rows={len(srows):6d} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"oracle error: {str(e)[:300]}"))
            print(f"{name:20s} ORACLE-ERROR {str(e)[:160]}")
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        sh = frame_hash(scols, [[r[c] for c in scols] for r in srows])
        oh = frame_hash(ocols, orows)
        ok_hash = sh == oh
        status = "OK" if (ok_cols and ok_count and ok_hash) else "MISMATCH"
        print(
            f"{name:20s} {status} rows={len(srows)}/{len(orows)} "
            f"cols={'=' if ok_cols else scols} hash={'=' if ok_hash else (sh[:8], oh[:8])}"
        )
        if status != "OK":
            failures.append((name, f"cols={ok_cols} count={ok_count} hash={ok_hash}"))
            if not ok_hash and ok_count and ok_cols:
                # show a few differing rows for debugging
                sset = {frame_hash(scols, [[r[c] for c in scols]]) for r in srows[:2000]}
                for orow in orows[:2000]:
                    if frame_hash(ocols, [orow]) not in sset:
                        print("   oracle-only row:", orow)
                        break
    print()
    if failures:
        print("FAILURES:", [f[0] for f in failures])
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
