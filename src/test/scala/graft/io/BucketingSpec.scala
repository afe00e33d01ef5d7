package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without exchange or sort") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    // the metastore is in-memory per JVM: drop both the (possibly unknown)
    // table entry and any directory a previous JVM left behind
    Seq("graft_orders_b", "graft_lineitem_b").foreach(Bucketing.dropTable(spark, _))
    Bucketing.saveBucketed(orders, "graft_orders_b", "o_orderkey", 4)
    Bucketing.saveBucketed(lineitem, "graft_lineitem_b", "l_orderkey", 4)

    val joined = spark.table("graft_lineitem_b").hint("merge")
      .join(spark.table("graft_orders_b"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"co-bucketed join still shuffles:\n$plan")
    assert(joined.count() === lineitem.count())
  }

  test("q_bucketed_join's join stage is exchange-free up to the aggregation") {
    val df = graft.queries.Relational.qBucketedJoin(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // the only exchanges allowed are AFTER the join: the group-by hash
    // exchange and the order-by range exchange — nothing below the SMJ
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a sort-merge join:\n$plan")
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      s"exchange below the bucketed join:\n$plan")
    assert(df.count() === 5)
  }
}
