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
  python3 tools/robustness_check.py [src_sf_dir] [--seed N]
  # then: SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /tmp/robust_sf /tmp/verify_robust"
  #       python3 tools/check_oracle.py /tmp/robust_sf /tmp/verify_robust

--seed N (r16 verdict #8) additionally injects a REPRODUCIBLE random
sweep of the degenerate classes the fixed rows pin one-at-a-time:
random NULL placement, duplicate texts/vectors under fresh ids,
token-shuffled near-dups, zero-width splits, nanosecond timestamp ties
at random rows, and decimal-lattice values parked ON 6-dp half
boundaries (the embed_second_pc tie-rounding class found in r16 by
composition luck — this hunts it systematically). Same seed, same
fixture, so any divergence is replayable.
"""
import glob
import os
import random
import shutil
import sys

import duckdb

args = sys.argv[1:]
seed = None
if "--seed" in args:
    i = args.index("--seed")
    seed = int(args[i + 1])
    del args[i:i + 2]
src = args[0] if args else "/root/testdata/sf0.001"
rng = random.Random(seed) if seed is not None else None
dst = "/tmp/robust_sf"

shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
for p in glob.glob(f"{src}/*.parquet"):
    name = os.path.basename(p)
    if name not in ("documents.parquet", "embeddings.parquet", "events.parquet"):
        os.symlink(p, f"{dst}/{name}")

con = duckdb.connect()
# injected ids start past the real id range — hardcoded ids would collide
# with real rows at larger scale factors and corrupt the comparison
doc0 = con.execute(f"SELECT max(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')").fetchone()[0]
vec0 = con.execute(f"SELECT max(vec_id) + 1 FROM read_parquet('{src}/embeddings.parquet')").fetchone()[0]
con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/documents.parquet')
  UNION ALL
  SELECT * FROM (VALUES
    ({doc0 + 0}, 'solo', 'en', 'src0', 4),
    ({doc0 + 1}, '', 'en', 'src1', 0),
    ({doc0 + 2}, 'a  b', 'de', 'src2', 4),
    ({doc0 + 3}, 'x y', 'en', 'src1', 3),
    -- combining-mark rows (r11 verdict #6): decomposed e+0301 vs composed
    -- e-acute — identical after NFC; zero-width-split token; C1 control.
    -- Exercises text_normalize's whole pipeline and every tokenizer op's
    -- handling of multi-codepoint graphemes.
    ({doc0 + 4}, 'cafe' || chr(769) || ' latte', 'fr', 'src2', 11),
    ({doc0 + 5}, 'caf' || chr(233) || ' latte', 'fr', 'src2', 10),
    ({doc0 + 6}, 'zero' || chr(8203) || 'width MIXED' || chr(133) || 'Case', 'en', 'src0', 21),
    -- astral-plane row (r12): a 4-byte UTF-8 emoji is TWO UTF-16 units on
    -- the JVM but ONE codepoint in DuckDB — pins the arithmetic UTF-8
    -- byte expansion in the FNV oracles, dedup_edit's ASCII-subsequence
    -- key, and every tokenizer op against surrogate-pair counting drift.
    ({doc0 + 7}, 'hot ' || chr(128293) || ' take ' || chr(128293) || ' news', 'en', 'src0', 14),
    -- NULL poison rows (r14 advisor): a NULL text (valid id) and a NULL id
    -- (valid text). The engine's stance is documented per-op (NULL text
    -- packs/counts as empty, NULL ids are dropped where an id is required);
    -- these rows make the gate actually exercise that path instead of the
    -- equivalence resting on fixtures that never produce NULLs.
    ({doc0 + 8}, NULL, 'en', 'src0', 0),
    (NULL, 'orphan row with no id', 'en', 'src1', 21)
  ) t(doc_id, text, lang, source, n_chars)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")
if rng:
    # seeded random document rows: duplicates, NULLs, doubled spaces,
    # zero-width splits, token-shuffled near-dups — placed at random
    # real rows each seed instead of the same hand-picked spots
    base_rows = con.execute(
        f"SELECT text, lang, source FROM read_parquet('{dst}/documents.parquet') "
        "WHERE text IS NOT NULL AND length(text) > 0 ORDER BY doc_id LIMIT 500"
    ).fetchall()
    picks = rng.sample(base_rows, min(8, len(base_rows)))
    vals = []
    nid = doc0 + 9
    for text, lang, srcname in picks:
        kind = rng.randrange(5)
        if kind == 0:      # exact duplicate text under a fresh id
            t = text
        elif kind == 1:    # random NULL placement
            t = None
        elif kind == 2:    # doubled whitespace at a random word gap
            w = text.split(" ")
            j = rng.randrange(max(1, len(w) - 1))
            t = " ".join(w[:j + 1]) + "  " + " ".join(w[j + 1:])
        elif kind == 3:    # zero-width split, kept short (ASCII-media invariant)
            t = text.split(" ")[0][:10] + "\u200b" + "zw"
        else:              # token-shuffled near-dup
            w = text.split(" ")
            rng.shuffle(w)
            t = " ".join(w)
        vals.append((nid, t, lang, srcname, len(t) if t is not None else 0))
        nid += 1
    con.execute(f"CREATE TABLE rdocs AS SELECT * FROM read_parquet('{dst}/documents.parquet')")
    con.executemany("INSERT INTO rdocs VALUES (?, ?, ?, ?, ?)", vals)
    con.execute(f"COPY rdocs TO '{dst}/documents.parquet' (FORMAT PARQUET)")

# media-framing invariant (r14 advisor): the frame-dedup oracles (C43/C87)
# frame by CHARACTERS while the engine frames UTF-8 BYTES of encode(text) —
# exact only while every doc long enough to emit a frame (>= 64 bytes, the
# smaller of the two ops' thresholds) is pure ASCII (byte length == char
# length). Enforce it on the fixture so a generator change can never
# silently un-pin the equivalence.
bad_media = con.execute(f"""
  SELECT count(*) FROM read_parquet('{dst}/documents.parquet')
  WHERE text IS NOT NULL AND strlen(text) >= 64 AND strlen(text) <> len(text)
""").fetchone()[0]
assert bad_media == 0, (
    f"{bad_media} document rows are >= 64 bytes AND non-ASCII: the C43/C87 "
    "char-framed oracles would diverge from the engine's byte framing — "
    "keep non-ASCII rows under 64 bytes or rewrite the oracles on bytes")
# degenerate embeddings: a zero vector (cosine 0/0 -> ANSI crash if
# unguarded) and an exact duplicate of corpus vector 30 (tie-breaking)
con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/embeddings.parquet')
  UNION ALL
  SELECT {vec0}::BIGINT, (SELECT [0.0::FLOAT for _ in range(len(embedding))]
    FROM read_parquet('{src}/embeddings.parquet') LIMIT 1), 0
  UNION ALL
  SELECT {vec0 + 1}::BIGINT, embedding, label
    FROM read_parquet('{src}/embeddings.parquet') WHERE vec_id = 30
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
""")
if rng:
    # seeded random embedding rows: duplicate vectors at RANDOM sources
    # (tie-breaking anywhere, not just vec 30), a NULL-label row, and a
    # vector of decimal-lattice components parked ON the 6-dp half
    # boundary (k·1e-6 + 5e-7): sums/means of these park on half
    # boundaries too — the embed_second_pc rounding class, hunted
    # systematically instead of found by composition luck
    dims = con.execute(
        f"SELECT len(embedding) FROM read_parquet('{dst}/embeddings.parquet') LIMIT 1"
    ).fetchone()[0]
    real_ids = [r[0] for r in con.execute(
        f"SELECT vec_id FROM read_parquet('{src}/embeddings.parquet') "
        "ORDER BY vec_id LIMIT 500").fetchall()]
    con.execute(f"CREATE TABLE rembs AS SELECT * FROM read_parquet('{dst}/embeddings.parquet')")
    nid = vec0 + 2
    for rv in rng.sample(real_ids, min(4, len(real_ids))):
        con.execute(
            f"INSERT INTO rembs SELECT {nid}::BIGINT, embedding, label "
            f"FROM rembs WHERE vec_id = {rv}")
        nid += 1
    parked = [rng.randrange(0, 1000) * 1e-6 + 5e-7 for _ in range(dims)]
    con.execute(
        f"INSERT INTO rembs VALUES ({nid}::BIGINT, {parked}::FLOAT[], NULL)")
    con.execute(f"COPY rembs TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")
# degenerate events: a tied timestamp (window/funnel/asof tie-breaking), a
# lone event type with a single hourly bucket (trailing-z null path), and
# a zero-value event (decimal-sum edge). Written via PYARROW, not a DuckDB
# COPY: DuckDB reads TIMESTAMP(NANOS) as microsecond TIMESTAMP and a COPY
# would silently downgrade the physical type, breaking graft's
# nanosAsLong read path — pyarrow preserves timestamp[ns].
import pyarrow as pa
import pyarrow.parquet as pq

import pyarrow.compute as pc

evt = pq.read_table(f"{src}/events.parquet")
ev0 = pc.max(evt.column("event_id")).as_py() + 1
# the tied timestamp must tie at NANOSECOND precision: .as_py() without
# pandas truncates to datetime's microseconds, silently un-tying the row
# (and nothing would flag it — both engines read the same un-tied data),
# so the raw int64 epoch-nanos value is carried instead
ts_type = evt.schema.field("ts").type
first_ts_ns = evt.column("ts").cast(pa.int64())[0].as_py()
first_user = evt.column("user_id")[0].as_py()
first_type = evt.column("event_type")[0].as_py()
extra = pa.table({
    "event_id": pa.array([ev0, ev0 + 1], pa.int64()),
    "ts": pa.array([first_ts_ns, first_ts_ns], pa.int64()).cast(ts_type),
    "user_id": pa.array([first_user, 424242], pa.int64()),
    "event_type": pa.array([first_type, "solo_type"], pa.string()),
    "value": pa.array([0.0, 1.0], pa.float64()),
    "props": pa.array(["{}", "{}"], pa.string()),
}).select([f.name for f in evt.schema]).cast(pa.schema([(f.name, f.type) for f in evt.schema]))
extras = [evt, extra]
if rng:
    # seeded random event rows: nanosecond-tied clones of RANDOM rows
    # (window/asof/funnel tie-breaking at arbitrary positions) with
    # values parked on the 6-dp half boundary
    n_real = evt.num_rows
    idxs = sorted(rng.sample(range(n_real), min(3, n_real)))
    ts_ns = evt.column("ts").cast(pa.int64())
    rnd = pa.table({
        "event_id": pa.array([ev0 + 2 + j for j in range(len(idxs))], pa.int64()),
        "ts": pa.array([ts_ns[i].as_py() for i in idxs], pa.int64()).cast(ts_type),
        "user_id": pa.array([evt.column("user_id")[i].as_py() for i in idxs], pa.int64()),
        "event_type": pa.array([evt.column("event_type")[i].as_py() for i in idxs], pa.string()),
        "value": pa.array([rng.randrange(0, 1000) * 1e-6 + 5e-7 for _ in idxs], pa.float64()),
        "props": pa.array(["{}"] * len(idxs), pa.string()),
    }).select([f.name for f in evt.schema]).cast(
        pa.schema([(f.name, f.type) for f in evt.schema]))
    extras.append(rnd)
pq.write_table(pa.concat_tables(extras), f"{dst}/events.parquet")
assert pq.read_schema(f"{dst}/events.parquet").field("ts").type == ts_type, \
    "events ts physical type must survive the rewrite (nanosAsLong contract)"
back = pq.read_table(f"{dst}/events.parquet", filters=[("event_id", "=", ev0)])
assert back.column("ts").cast(pa.int64())[0].as_py() == first_ts_ns, \
    "planted tie lost its nanosecond component through the write"

nd = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet')").fetchone()[0]
ne = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/embeddings.parquet')").fetchone()[0]
nv = pq.read_table(f"{dst}/events.parquet").num_rows
mode = f"seed={seed} randomized + fixed" if seed is not None else "fixed"
print(f"wrote {dst} ({nd} documents, {ne} embeddings, {nv} events incl. degenerate rows; {mode});")
print("now: SPARK_GRAFT_CPUS=8 sbt -batch 'runMain graft.Verify /tmp/robust_sf /tmp/verify_robust'")
print("     python3 tools/check_oracle.py /tmp/robust_sf /tmp/verify_robust")
