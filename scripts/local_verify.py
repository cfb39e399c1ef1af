#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
reads each <outDir>/<name> parquet (Spark result), replays
<outDir>/oracle_sql.json in DuckDB over the same testdata parquet, and
compares: schema (column names), row count, and values (exact + 1e-9
tolerance for floats), with rows sorted and columns sorted by name —
like the driver's hash compare, but with diagnostics on mismatch.

Usage: python3 scripts/local_verify.py <sfDir> <outDir> [name_filter]
"""
import json, math, os, sys
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if isinstance(v, list):
        # reached only for rows-only entries: oracle-carrying rows are
        # rejected above on any complex top-level column (the driver's
        # pandas row sort crashes on them — r15's two red rows shipped
        # because this norm() used to hide exactly that)
        return tuple(norm(x) for x in v)
    return v

def complex_cols(rel):
    """Top-level LIST/STRUCT/MAP columns — the driver's differ cannot
    hash them; the local gate must reject what the driver rejects."""
    return [c for c, t in zip(rel.columns, rel.types)
            if any(k in str(t) for k in ("[]", "STRUCT", "MAP"))]

def close(a, b):
    if type(a) != type(b) and not (isinstance(a,(int,float)) and isinstance(b,(int,float))):
        return a == b
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b or abs(a-b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a)==len(b) and all(close(x,y) for x,y in zip(a,b))
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    name_filter = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if name_filter and name_filter not in name: continue
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: rows={len(spark_rel.fetchall())}")
            continue
        try:
            duck_rel = con.sql(oracle[name])
        except Exception as e:
            n_fail += 1
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            continue
        bad_s, bad_d = complex_cols(spark_rel), complex_cols(duck_rel)
        if bad_s or bad_d:
            n_fail += 1
            print(f"✗ {name}: DIFFER CONTRACT: complex top-level columns "
                  f"(driver row sort crashes on these) spark={bad_s} duck={bad_d}")
            continue
        s_cols = sorted(c.lower() for c in spark_rel.columns)
        d_cols = sorted(c.lower() for c in duck_rel.columns)
        if s_cols != d_cols:
            n_fail += 1
            print(f"✗ {name}: COLUMN MISMATCH spark={s_cols} duck={d_cols}")
            continue
        s_idx = [ [c.lower() for c in spark_rel.columns].index(c) for c in s_cols ]
        d_idx = [ [c.lower() for c in duck_rel.columns].index(c) for c in d_cols ]
        # dtype audit: DECIMAL-vs-DOUBLE / HUGEINT-vs-BIGINT mismatches can
        # flip the driver's arrow-level hash even when Python values compare
        # equal below — surface them as warnings (int widths are benign:
        # r04 greens include INT32-vs-BIGINT columns).
        def base(t):
            t = str(t)
            if t.startswith('DECIMAL'): return 'DECIMAL'
            if t in ('TINYINT','SMALLINT','INTEGER','BIGINT',
                     'UTINYINT','USMALLINT','UINTEGER','UBIGINT'): return 'INT'
            return t
        s_types = {c.lower(): t for c, t in zip(spark_rel.columns, spark_rel.types)}
        d_types = {c.lower(): t for c, t in zip(duck_rel.columns, duck_rel.types)}
        for c in s_cols:
            bs, bd = base(s_types[c]), base(d_types[c])
            if bs != bd or (bs == 'DECIMAL' and str(s_types[c]) != str(d_types[c])) \
               or 'HUGEINT' in (str(s_types[c]), str(d_types[c])):
                print(f"  ! {name}.{c}: dtype spark={s_types[c]} duck={d_types[c]} (driver hash risk)")
        s_rows = sorted([tuple(norm(r[i]) for i in s_idx) for r in spark_rel.fetchall()], key=repr)
        d_rows = sorted([tuple(norm(r[i]) for i in d_idx) for r in duck_rel.fetchall()], key=repr)
        if len(s_rows) != len(d_rows):
            n_fail += 1
            print(f"✗ {name}: ROW COUNT spark={len(s_rows)} duck={len(d_rows)}")
            continue
        exact = s_rows == d_rows and \
            [tuple(map(repr, r)) for r in s_rows] == [tuple(map(repr, r)) for r in d_rows]
        tol = exact or all(close(a, b) for a, b in zip(s_rows, d_rows))
        if exact:
            n_pass += 1
            print(f"✓ {name}: {len(s_rows)} rows exact")
        elif tol:
            n_pass += 1
            bad = next((i for i,(a,b) in enumerate(zip(s_rows,d_rows))
                        if a != b or tuple(map(repr,a)) != tuple(map(repr,b))), 0)
            print(f"~ {name}: {len(s_rows)} rows tolerance-only (HASH RISK) e.g. row {bad}:")
            print(f"    spark={s_rows[bad]}")
            print(f"    duck ={d_rows[bad]}")
        else:
            n_fail += 1
            bad = next(i for i,(a,b) in enumerate(zip(s_rows,d_rows)) if not close(a,b))
            print(f"✗ {name}: VALUE MISMATCH at sorted row {bad}:")
            print(f"    spark={s_rows[bad]}")
            print(f"    duck ={d_rows[bad]}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
