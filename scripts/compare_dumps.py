#!/usr/bin/env python3
"""Bit-identity comparison of two Verify dump dirs — the partition-count
determinism sweep: dump the catalog with different SPARK_GRAFT_CPUS
values and every query's result must be identical (EXCEPT ALL both
ways, per query).

Usage: python3 scripts/compare_dumps.py <dirA> <dirB>
"""
import os, sys
import duckdb


def main():
    a, b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
    bad = 0
    for n in names:
        if not os.path.isdir(os.path.join(b, n)):
            print(f"MISSING in {b}: {n}")
            bad += 1
            continue
        try:
            d1 = con.sql(
                f"SELECT count(*) FROM ((SELECT * FROM '{a}/{n}/*.parquet') "
                f"EXCEPT ALL (SELECT * FROM '{b}/{n}/*.parquet'))").fetchone()[0]
            d2 = con.sql(
                f"SELECT count(*) FROM ((SELECT * FROM '{b}/{n}/*.parquet') "
                f"EXCEPT ALL (SELECT * FROM '{a}/{n}/*.parquet'))").fetchone()[0]
            if d1 or d2:
                print(f"DIFF {n}: A-B={d1} B-A={d2}")
                bad += 1
        except Exception as e:
            print(f"ERR {n}: {e}")
            bad += 1
    print(f"{len(names)} queries compared, {bad} diffs")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
