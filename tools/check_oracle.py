#!/usr/bin/env python
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the recorded oracle SQL in DuckDB
over the same parquet tables, then compares (columns sorted by name, rows
sorted, values stringified) — the same normalisation the driver describes.
"""
import json, os, sys, math
import duckdb

# Optional per-oracle wall budget (ORACLE_TIMEOUT_S env var, seconds): a
# stress-scale replica can outgrow what an ORACLE can afford even when the
# engine is fine — DuckDB's unrolled CTE chains are exponential in places
# the engine is linear. A timed-out oracle reports as TIMEOUT (an
# oracle-side scale limit to document), never as FAIL. The driver's gate
# runs without the env var, exactly as before.
TIMEOUT_S = int(os.environ.get("ORACLE_TIMEOUT_S", "0"))

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_fmt(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out

def _fmt(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return str(v)

def main(sfdir, outdir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver fixtures are single files; Spark-written replicas (the sf1
        # stress dir) are DIRECTORIES of part files — glob those
        src = f"{sfdir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
        except Exception:
            pass
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_timeout = 0
    import glob, os
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d): continue
        spark_rel = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        spark_cols = [c[0] for c in spark_rel.description]
        spark_rows = spark_rel.fetchall()
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(spark_rows)} rows " +
                  ("OK" if len(spark_rows) > 0 else "EMPTY!"))
            continue
        timer = None
        # done-flag + lock guard the timer race: the check-and-interrupt is
        # atomic against the done-append, so a timer that loses the race
        # skips the interrupt. The one window neither closes — fetchall()
        # has RETURNED but the done-append hasn't run when the timer checks
        # — leaves a stale interrupt flag on the connection with no query
        # running; the sentinel SELECT 1 before the NEXT timed oracle
        # absorbs that flag so the real execute() never raises spuriously.
        import threading
        done = []
        lock = threading.Lock()
        def _interrupt():
            with lock:
                if not done:
                    con.interrupt()
        try:
            if TIMEOUT_S:
                try:
                    con.execute("SELECT 1").fetchall()
                except duckdb.InterruptException:
                    pass  # stale flag from a prior oracle's late timer
                timer = threading.Timer(TIMEOUT_S, _interrupt)
                timer.start()
            duck_rel = con.execute(oracle[name])
            duck_cols = [c[0] for c in duck_rel.description]
            duck_rows = duck_rel.fetchall()
            with lock:
                done.append(True)
        except duckdb.InterruptException:
            print(f"TIMEOUT {name}: oracle exceeded {TIMEOUT_S}s (oracle-side scale limit)")
            n_timeout += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        finally:
            with lock:
                done.append(True)
            if timer is not None:
                timer.cancel()
        sc, sr = norm(spark_rows, spark_cols)
        dc, dr = norm(duck_rows, duck_cols)
        if sc != dc:
            print(f"FAIL {name}: schema mismatch spark={sc} duck={dc}")
            n_fail += 1
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}; first diffs: {diffs}")
            if len(sr) != len(dr):
                only_s = set(sr) - set(dr); only_d = set(dr) - set(sr)
                print(f"   only-spark: {list(only_s)[:2]}  only-duck: {list(only_d)[:2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail" +
          (f", {n_timeout} oracle-timeout" if n_timeout else ""))
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
