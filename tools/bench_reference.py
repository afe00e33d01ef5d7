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


def pg_convert_workload(spark, part, orders):
    """triples -> PG-Format through the reference's triples_2_pg_df
    (4 filtered groupBys + 3 joins, src/ketl/io/core.py:16). The input
    triples (A1 nodes + A2 edges) are CACHED and materialised first so
    the timing isolates the conversion — graft.tools.BenchPgConvert does
    the same on its side.
    """
    # ketl.io.core imports a helper package absent from this container, so
    # the function body (src/ketl/io/core.py:56-112) is reproduced verbatim
    # in plan terms below — 5 filtered groupBys + 4 left joins on id —
    # which is the thing being timed.
    from pyspark.sql import functions as F

    def triples_2_pg_df(triples_df):
        type_labels = (triples_df.filter(F.col("key") == "@type")
                       .groupBy("id").agg(F.collect_set("value").alias("labels")))
        from_values = (triples_df.filter(F.col("key") == "@from")
                       .groupBy("id").agg(F.first("value").alias("from")))
        to_values = (triples_df.filter(F.col("key") == "@to")
                     .groupBy("id").agg(F.first("value").alias("to")))
        property_values = (triples_df
                           .filter(~F.col("key").isin("@type", "@from", "@to"))
                           .groupBy("id", "key")
                           .agg(F.collect_set("value").alias("values")))
        properties = property_values.groupBy("id").agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("key"), F.col("values")))
            ).alias("properties"))
        result = (triples_df.select("id").distinct()
                  .join(type_labels, on="id", how="left")
                  .join(from_values, on="id", how="left")
                  .join(to_values, on="id", how="left")
                  .join(properties, on="id", how="left"))
        result = result.withColumn(
            "properties",
            F.when(F.col("properties").isNull(), F.create_map())
             .otherwise(F.col("properties")))
        return result.withColumn(
            "type",
            F.when(F.col("from").isNotNull(), F.lit("edge"))
             .otherwise(F.lit("node")))

    triples = nodes_mapper().map(part).union(edges_mapper().map(orders))
    triples = triples.cache()
    n_triples = triples.count()
    pg = triples_2_pg_df(triples)
    n_rows = pg.count()
    secs = time_noop(pg)

    # pg_df_2_pg_jsonl (src/ketl/io/core.py:130): toLocalIterator + per-row
    # json.loads/json.dumps ON THE DRIVER — reproduced verbatim below (its
    # dump_output helper import is absent from the container). The PG frame
    # is cached first so the timing isolates the serialization+write, as
    # graft.tools.BenchPgConvert does for its distributed writeJsonl.
    import json as _json
    pg = pg.cache()
    pg.count()

    def jsonl_pass(path):
        t0 = time.monotonic()
        with open(path, "w") as fh:
            for row in pg.toLocalIterator():
                properties = {k: [_json.loads(v) for v in vlist]
                              for k, vlist in row.properties.items()}
                elem = {"type": row.type, "id": row.id, "labels": row.labels,
                        "properties": properties}
                if row.type == "edge":
                    elem["from"] = row["from"]
                    elem["to"] = row["to"]
                fh.write(_json.dumps(elem) + "\n")
        return time.monotonic() - t0

    jtimes = [jsonl_pass(f"/tmp/ref_pg_{i}.jsonl") for i in range(REPS + 1)]
    jsonl_secs = min(jtimes[1:])
    pg.unpersist()
    triples.unpersist()
    return secs, n_triples, n_rows, jsonl_secs


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
    secs, n_triples, n_rows, jsonl_secs = pg_convert_workload(spark, part, orders)
    out["queries"]["pg_convert"] = round(secs, 3)
    out["queries"]["pg_jsonl_write"] = round(jsonl_secs, 3)
    out["rows"]["pg_convert"] = n_rows
    out["rows"]["pg_convert_input_triples"] = n_triples
    out["value"] = round(sum(out["queries"].values()), 3)
    out["metric"] = "reference_total"
    out["unit"] = "sec"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
