"""Head-to-head: the reference's tabmap (mapInPandas + per-row Python
loops, src/ketl/tabmap/core.py:303) vs graft's Column-expression tabmap on
the SAME Spark build (4.1.2), master (local[32]), shuffle partitions (32),
input parquet, and noop sink — the measured version of the architectural
bench_vs_baseline argument.

Usage:
    python3 tools/bench_reference.py /root/testdata/sf0.1
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      SPARK_GRAFT_BENCH_ONLY=tabmap_nodes,tabmap_edges \
      sbt -batch 'runMain graft.Bench'       # the graft side, same protocol

Workloads are the A1/A2 queries verbatim (same mappings, same output
triples — the script cross-checks row counts and, at <=sf0.01, the exact
row multiset against graft's DuckDB oracle SQL). Protocol matches
graft.Bench: 1 discarded warmup + N reps, min.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/reference/src")

from pyspark.sql import SparkSession  # noqa: E402

import ketl.helpers as khelpers  # noqa: E402
import ketl.tabmap.helpers as tbhelpers  # noqa: E402
from ketl.core import ConstantTripleMapper  # noqa: E402
from ketl.tabmap.core import (ColumnTripleMapper, ColumnValueMapper,  # noqa: E402
                              SparkDataFrameMapper)

REPS = int(os.environ.get("REF_BENCH_REPS", "2"))


def nodes_mapper():
    """A1 verbatim: part -> node triples (GraphEtl.tabmapNodes)."""
    id_mapper = ColumnValueMapper("p_partkey").with_value_wrapper(
        khelpers.string_value_wrapper(prefix="part:"))
    components = [
        ColumnTripleMapper("p_name", "hasName"),
        ColumnTripleMapper("p_brand", "brand"),
        ColumnTripleMapper("p_size", "size"),
        ColumnTripleMapper("p_retailprice", "retailPrice"),
        khelpers.type_triple_mapper("Part"),
        ConstantTripleMapper("source", "TPCH"),
    ]
    return SparkDataFrameMapper(id_mapper, mapper_components=components)


def edges_mapper():
    """A2 verbatim: orders -> 'placed' edge triples with auto edge ids
    (GraphEtl.tabmapEdges)."""
    from_map = tbhelpers.edge_source_row_triple_mapper(
        tbhelpers.row_value_mapper(
            lambda r: "cust:" + str(r["o_custkey"])
        ).with_column_ids(["o_custkey"]))
    to_map = tbhelpers.edge_target_row_triple_mapper(
        tbhelpers.row_value_mapper(
            lambda r: "order:" + str(r["o_orderkey"])
        ).with_column_ids(["o_orderkey"]))
    components = [
        khelpers.type_triple_mapper("placed"),
        from_map,
        to_map,
        ColumnTripleMapper("o_totalprice", "totalPrice"),
    ]
    return SparkDataFrameMapper(SparkDataFrameMapper.AutoEdgeId(),
                                mapper_components=components)


def time_noop(df):
    times = []
    for _ in range(REPS + 1):  # first pass = discarded warmup
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.monotonic() - t0)
    return min(times[1:])


def main(sfdir):
    spark = (SparkSession.builder.master("local[32]")
             .appName("ketl-reference-bench")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    part = spark.read.parquet(f"{sfdir}/part.parquet")
    orders = spark.read.parquet(f"{sfdir}/orders.parquet")

    out = {"sf": sfdir, "reps": REPS, "queries": {}, "rows": {}}
    for name, mapper, src in [("tabmap_nodes", nodes_mapper(), part),
                              ("tabmap_edges", edges_mapper(), orders)]:
        triples = mapper.map(src)
        out["rows"][name] = triples.count()
        out["queries"][name] = round(time_noop(triples), 3)
    out["value"] = round(sum(out["queries"].values()), 3)
    out["metric"] = "reference_total"
    out["unit"] = "sec"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
