#!/usr/bin/env python3
"""Reconstruct per-query bench timings from the driver's bounded stdout tail.

graft.Bench prints three stdout records: the full keyed seconds map (also
written whole to bench.json), a compact base36-milliseconds line
(`timings_b36`), and a short total line. The round driver archives only the
LAST ~2000 chars of stdout (the "tail" field of BENCH_r{N}.json), so the
compact line is the per-query record that must always survive whole: at
~3.3 chars/query it holds ~500 queries in half the window, where the
decimal-int `timings_ms` form it replaced (rounds 14-15) was within 2x of
eviction at 191 queries.

Usage:
  python3 tools/parse_bench_tail.py BENCH_r16.json [bench.json]
  python3 tools/parse_bench_tail.py bench_stdout.log [bench.json]

The first argument is either a driver BENCH_r{N}.json (the tail is read
from its "tail" field) or a raw log/stdout file. The last timings_b36 line
is decoded and zipped with the sorted non-failed query keys, taken from the
second argument's full "queries" map when given (every zipped value is then
also CROSS-CHECKED against the map — the zip check), else from an
oracle_sql.json sitting next to the input, else keys are emitted as
positional indices.

Exit 0 = decoded (and, when a key source was available, zip-verified);
exit 1 = the compact line is missing/truncated or the zip check failed.
"""
import json
import os
import sys


def fail(msg: str) -> None:
    print(f"FAIL: {msg}", file=sys.stderr)
    sys.exit(1)


def extract_tail(path: str) -> str:
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "tail" in doc:
            return doc["tail"]
    except json.JSONDecodeError:
        pass
    return text


def last_b36_record(tail: str) -> dict:
    # scan literal lines; the window may cut the FRONT of the first line,
    # so only a line that parses as a whole JSON object counts
    recs = []
    for line in tail.replace("\\n", "\n").splitlines():
        line = line.strip()
        if '"metric":"timings_b36"' not in line:
            continue
        start = line.find("{")
        if start < 0:
            continue
        try:
            recs.append(json.loads(line[start:]))
        except json.JSONDecodeError:
            continue
    if not recs:
        fail("no whole timings_b36 line in the tail (missing or truncated)")
    return recs[-1]


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    rec = last_b36_record(extract_tail(sys.argv[1]))
    raw = rec.get("values", "")
    values = [int(v, 36) for v in raw.split(".")] if raw else []
    if len(values) != rec.get("n", -1):
        fail(f"decoded {len(values)} values but line claims n={rec.get('n')}")
    failed = set(rec.get("failed", []))

    keys, full = None, None
    if len(sys.argv) > 2:
        with open(sys.argv[2]) as f:
            full = json.load(f).get("queries", {})
        keys = sorted(k for k in full if k not in failed)
    else:
        oracle = os.path.join(os.path.dirname(sys.argv[1]), "oracle_sql.json")
        if os.path.exists(oracle):
            with open(oracle) as f:
                keys = sorted(k for k in json.load(f) if k not in failed)

    if keys is not None and len(keys) != len(values):
        fail(f"{len(keys)} keys vs {len(values)} values — key source mismatch")
    pairs = list(zip(keys, values)) if keys is not None \
        else list(enumerate(values))
    for k, ms in pairs:
        print(f"{k}\t{ms}")
    if full is not None:
        bad = [k for k, ms in pairs if round(full[k] * 1000) != ms]
        if bad:
            fail(f"zip check: {len(bad)} values disagree with the full map "
                 f"(first: {bad[0]})")
        print(f"OK: zip check passed for all {len(pairs)} queries",
              file=sys.stderr)
    sys.exit(0)


if __name__ == "__main__":
    main()
