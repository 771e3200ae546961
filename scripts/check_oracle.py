#!/usr/bin/env python3
"""Dev-only mimic of the driver's correctness gate (NOT part of the
engine): compares Verify.scala's parquet dumps against DuckDB running
SparkEntry.oracleSql on the same tables. Usage:
  python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [query...]

A FULL run (no query filter) also writes CORRECTNESS_LATEST.json at
the repo root in the driver artifact's exact per-query schema
(rows_match/schema_match/hash_match/spark_rows/oracle_rows/err), so a
driver-side capture failure (CORRECTNESS_r12.json arrived as `{}`)
can never again leave a round without a durable, repo-tracked
correctness record — the Bench/BENCH_LATEST.json convention.
"""
import sys, os, json, math, glob
import duckdb

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows):
    def key(r):
        return tuple((x is None, str(x)) for x in r)
    return sorted(rows, key=key)

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf or abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    record = {}

    def rec(name, spark_rows=None, oracle_rows=None, rows=False,
            schema=False, h=False, err=None):
        record[name] = {
            "rows_match": rows, "schema_match": schema, "hash_match": h,
            "spark_rows": spark_rows, "oracle_rows": oracle_rows, "err": err}

    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output")
            rec(name, err="no spark output")
            n_fail += 1
            continue
        try:
            orel = con.sql(sql)
            ocols = list(orel.columns)
            otypes = dict(zip(orel.columns, [str(t) for t in orel.types]))
            srel = con.sql(f"SELECT * FROM '{spark_glob}'")
            scols = list(srel.columns)
            stypes = dict(zip(srel.columns, [str(t) for t in srel.types]))
            if sorted(ocols) != sorted(scols):
                print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
                rec(name, err=f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
                n_fail += 1
                continue
            cols = ", ".join(f'"{c}"' for c in sorted(ocols))
            orows = canon(con.sql(f"SELECT {cols} FROM orel").fetchall())
            srows = canon(con.sql(f"SELECT {cols} FROM srel").fetchall())
            tmis = [c for c in sorted(ocols) if otypes[c] != stypes[c]]
            if len(orows) != len(srows):
                print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
                rec(name, len(srows), len(orows), schema=True,
                    err=f"rows spark={len(srows)} oracle={len(orows)}")
                n_fail += 1
                continue
            bad = None
            for i, (sr, orr) in enumerate(zip(srows, orows)):
                if not all(eq(a, b) for a, b in zip(sr, orr)):
                    bad = (i, sr, orr)
                    break
            exact = srows == orows
            if bad:
                print(f"FAIL {name}: row {bad[0]} spark={bad[1]} oracle={bad[2]}")
                rec(name, len(srows), len(orows), rows=True, schema=True,
                    err=f"row {bad[0]} spark={bad[1]} oracle={bad[2]}")
                n_fail += 1
            else:
                note = "" if exact else " (float-tolerant only — NOT hash-exact!)"
                tnote = f" [type mismatch: {tmis}]" if tmis else ""
                print(f"PASS {name}: {len(srows)} rows{note}{tnote}")
                rec(name, len(srows), len(orows), rows=True, schema=True,
                    h=exact)
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            rec(name, err=f"{type(e).__name__}: {e}")
            n_fail += 1
    if not only:
        latest = os.path.join(REPO_ROOT, "CORRECTNESS_LATEST.json")
        with open(latest, "w") as f:
            json.dump({k: record[k] for k in sorted(record)}, f, indent=2)
        print(f"wrote {latest} ({len(record)} queries)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
