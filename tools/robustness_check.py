#!/usr/bin/env python3
"""Degenerate-data robustness harness for the oracle suite.

Builds a copy of an SF dir whose documents table gains adversarial rows
(empty text, one-token doc, double-space tokens), runs graft.Verify on it,
and compares every oracle in DuckDB — exactly like the driver, on data the
driver's generator might produce after a parameter change.

Found in round 7 (both fixed):
  - text_quality crashed under Spark 4 ANSI mode (/ length('') = 0), and
  - source_similarity's FNV oracle diverged on empty tokens (DuckDB
    unicode('') = -1 folds a phantom byte; the engine folds zero bytes).

Usage:
  python3 tools/robustness_check.py [src_sf_dir]
  # then: SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /tmp/robust_sf /tmp/verify_robust"
  #       python3 tools/check_oracle.py /tmp/robust_sf /tmp/verify_robust
"""
import glob
import os
import shutil
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
dst = "/tmp/robust_sf"

shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
for p in glob.glob(f"{src}/*.parquet"):
    name = os.path.basename(p)
    if name != "documents.parquet":
        os.symlink(p, f"{dst}/{name}")

con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/documents.parquet')
  UNION ALL
  SELECT * FROM (VALUES
    (9001, 'solo', 'en', 'src0', 4),
    (9002, '', 'en', 'src1', 0),
    (9003, 'a  b', 'de', 'src2', 4),
    (9004, 'x y', 'en', 'src1', 3)
  ) t(doc_id, text, lang, source, n_chars)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")
n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet')").fetchone()[0]
print(f"wrote {dst} ({n} documents incl. 4 degenerate); now run Verify + check_oracle on it")
