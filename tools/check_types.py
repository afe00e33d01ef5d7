#!/usr/bin/env python
"""Typed-schema sweep: the driver hashes TYPED values, so a DuckDB oracle
column that comes out HUGEINT/DECIMAL while Spark writes int64/double
hash-mismatches even when every value is identical (the r7
corpus_hist_quantiles red row). For each query dumped by graft.Verify,
compare the Spark parquet arrow schema with the DuckDB oracle result's
arrow schema field-by-field and report any divergence.

Usage: python tools/check_types.py <sfDir> <verifyOutDir>
"""
import json, os, sys
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        # single-file driver fixtures OR Spark-written part-file directories
        src = f"{sfdir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
        except Exception:
            pass
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d) or name not in oracle:
            continue
        spark_schema = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet') LIMIT 0").arrow().schema
        try:
            oracle_schema = con.execute(oracle[name]).arrow().schema
        except Exception as e:
            print(f"ERR  {name}: oracle failed: {e}")
            n_bad += 1
            continue
        spark_types = {f.name: f.type for f in spark_schema}
        diffs = []
        for f in oracle_schema:
            st = spark_types.get(f.name)
            if st is None:
                diffs.append(f"{f.name}: missing on spark side")
            elif str(st) != str(f.type):
                diffs.append(f"{f.name}: spark={st} oracle={f.type}")
        if diffs:
            print(f"TYPE-DIFF {name}: " + "; ".join(diffs))
            n_bad += 1
        else:
            n_ok += 1
    print(f"== {n_ok} type-clean, {n_bad} divergent")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
