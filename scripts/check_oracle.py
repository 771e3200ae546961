#!/usr/bin/env python3
"""Dev-only mimic of the driver's correctness gate (NOT part of the
engine): compares Verify.scala's parquet dumps against DuckDB running
SparkEntry.oracleSql on the same tables. Usage:
  python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [query...]

Compares run in a PROCESS POOL (env ORACLE_WORKERS, default 8): each
oracle query is independent — its own DuckDB connection over the same
parquet views — so the ~11-minute single-threaded sweep of a 430-entry
registry collapses to wall ≈ slowest-query + tail. Per-connection
DuckDB threads are capped so workers don't oversubscribe the host.

A FULL run (no query filter) also writes CORRECTNESS_LATEST.json at
the repo root in the driver artifact's exact per-query schema
(rows_match/schema_match/hash_match/spark_rows/oracle_rows/err), so a
driver-side capture failure (CORRECTNESS_r12.json arrived as `{}`)
can never again leave a round without a durable, repo-tracked
correctness record — the Bench/BENCH_LATEST.json convention.
"""
import sys, os, json, math, glob, time
from concurrent.futures import ProcessPoolExecutor

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

_CON = None
_CFG = {}

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

def _init(sf_dir, out_dir, threads):
    global _CON, _CFG
    import duckdb
    _CON = duckdb.connect()
    _CON.execute(f"SET threads={threads}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            _CON.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    _CFG = {"out_dir": out_dir}

def check_one(item):
    """(name, sql) -> (name, line, rec_dict, passed, elapsed)"""
    name, sql = item
    con, out_dir = _CON, _CFG["out_dir"]
    t0 = time.time()

    def rec(spark_rows=None, oracle_rows=None, rows=False,
            schema=False, h=False, err=None):
        return {"rows_match": rows, "schema_match": schema,
                "hash_match": h, "spark_rows": spark_rows,
                "oracle_rows": oracle_rows, "err": err}

    spark_glob = f"{out_dir}/{name}/*.parquet"
    if not glob.glob(spark_glob):
        return (name, f"FAIL {name}: no spark output",
                rec(err="no spark output"), False, time.time() - t0)
    try:
        orel = con.sql(sql)
        ocols = list(orel.columns)
        otypes = dict(zip(orel.columns, [str(t) for t in orel.types]))
        srel = con.sql(f"SELECT * FROM '{spark_glob}'")
        scols = list(srel.columns)
        stypes = dict(zip(srel.columns, [str(t) for t in srel.types]))
        if sorted(ocols) != sorted(scols):
            msg = f"columns spark={sorted(scols)} oracle={sorted(ocols)}"
            return (name, f"FAIL {name}: {msg}", rec(err=msg), False,
                    time.time() - t0)
        cols = ", ".join(f'"{c}"' for c in sorted(ocols))
        orows = canon(con.sql(f"SELECT {cols} FROM orel").fetchall())
        srows = canon(con.sql(f"SELECT {cols} FROM srel").fetchall())
        tmis = [c for c in sorted(ocols) if otypes[c] != stypes[c]]
        if len(orows) != len(srows):
            msg = f"rows spark={len(srows)} oracle={len(orows)}"
            return (name, f"FAIL {name}: {msg}",
                    rec(len(srows), len(orows), schema=True, err=msg),
                    False, time.time() - t0)
        bad = None
        for i, (sr, orr) in enumerate(zip(srows, orows)):
            if not all(eq(a, b) for a, b in zip(sr, orr)):
                bad = (i, sr, orr)
                break
        exact = srows == orows
        if bad:
            msg = f"row {bad[0]} spark={bad[1]} oracle={bad[2]}"
            return (name, f"FAIL {name}: {msg}",
                    rec(len(srows), len(orows), rows=True, schema=True,
                        err=msg), False, time.time() - t0)
        note = "" if exact else " (float-tolerant only — NOT hash-exact!)"
        tnote = f" [type mismatch: {tmis}]" if tmis else ""
        return (name, f"PASS {name}: {len(srows)} rows{note}{tnote}",
                rec(len(srows), len(orows), rows=True, schema=True,
                    h=exact), True, time.time() - t0)
    except Exception as e:
        msg = f"{type(e).__name__}: {e}"
        return (name, f"FAIL {name}: {msg}", rec(err=msg), False,
                time.time() - t0)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    items = [(n, s) for n, s in sorted(oracle.items())
             if not only or n in only]
    workers = max(1, int(os.environ.get(
        "ORACLE_WORKERS", str(min(8, os.cpu_count() or 4)))))
    threads = max(1, (os.cpu_count() or 4) // workers)
    t0 = time.time()
    results = []
    if workers == 1:
        _init(sf_dir, out_dir, os.cpu_count() or 4)
        results = [check_one(it) for it in items]
    else:
        with ProcessPoolExecutor(max_workers=workers, initializer=_init,
                                 initargs=(sf_dir, out_dir, threads)) as ex:
            results = list(ex.map(check_one, items))
    n_pass = sum(1 for r in results if r[3])
    n_fail = len(results) - n_pass
    record = {}
    for name, line, r, _, _ in sorted(results):
        print(line)
        record[name] = r
    slow = sorted(results, key=lambda r: -r[4])[:10]
    print("slowest oracles: " +
          ", ".join(f"{n} {dt:.1f}s" for n, _, _, _, dt in slow))
    if not only:
        latest = os.path.join(REPO_ROOT, "CORRECTNESS_LATEST.json")
        with open(latest, "w") as f:
            json.dump({k: record[k] for k in sorted(record)}, f, indent=2)
        print(f"wrote {latest} ({len(record)} queries)")
    print(f"== {n_pass} pass, {n_fail} fail == "
          f"({time.time() - t0:.1f}s, {workers} workers)")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
