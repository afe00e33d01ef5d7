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
    Seq("graft_orders_b", "graft_lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
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
}
