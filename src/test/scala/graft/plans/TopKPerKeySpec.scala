package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(k: Int) = {
    val df = Seq(
      (1, 10.0, "a"), (1, 30.0, "b"), (1, 20.0, "c"), (1, 5.0, "d"),
      (2, 7.0, "e"), (2, 9.0, "f"),
      (3, 1.0, "g")
    ).toDF("grp", "score", "tag")
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("tag"))
    df.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  test("rewrite fires: plan uses TopKPerKeyExec, no Window/Sort") {
    val plan = windowTopK(2).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKeyExec in:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window"),
      s"window survived rewrite:\n$plan")
  }

  test("results match window semantics incl. ranks") {
    val got = windowTopK(2).select("grp", "tag", "rk")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set(
      (1, "b", 1), (1, "c", 2),
      (2, "f", 1), (2, "e", 2),
      (3, "g", 1)))
  }

  test("residual non-rank predicates survive the rewrite") {
    val out = windowTopK(3).where(col("score") > 6.0)
      .select("grp", "tag").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out === Set((1, "b"), (1, "c"), (1, "a"), (2, "f"), (2, "e")))
  }

  test("k larger than any group returns all rows ranked") {
    val all = windowTopK(10).collect()
    assert(all.length === 7)
  }

  test("partial-phase key cap: overflow keys pass through, results stay exact") {
    val conf = spark.conf
    conf.set("spark.graft.topk.maxKeysPerPartition", "2")
    try {
      // 100 keys x 5 rows in few partitions — far over the 2-key cap, so
      // most keys take the unpruned pass-through path in the partial phase
      val df = spark.range(500)
        .select((col("id") % 100).as("grp"), (col("id") * 37 % 101).as("score"))
      val w = Window.partitionBy("grp").orderBy(col("score").desc, col("score"))
      val got = df.withColumn("rk", row_number().over(w)).where(col("rk") <= 2)
      val plan = got.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"))
      // exact top-2 per key, independently computed
      val expect = df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
          rows.map(_._2).sorted(Ordering[Long].reverse).take(2).toSeq.map((g, _))
        }.sorted
      val actual = got.select("grp", "score").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(actual === expect)
    } finally conf.set("spark.graft.topk.maxKeysPerPartition", "1048576")
  }

  test("rewrite gate: disabling keeps the stock window plan, same results") {
    val conf = spark.conf
    conf.set("spark.graft.topk.rewrite.enabled", "false")
    try {
      val gated = windowTopK(2)
      val plan = gated.queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKey"), s"rewrite ran while disabled:\n$plan")
      assert(plan.contains("Window"))
      val got = gated.select("grp", "tag", "rk")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
      assert(got === Set((1, "b", 1), (1, "c", 2), (2, "f", 1), (2, "e", 2), (3, "g", 1)))
    } finally conf.set("spark.graft.topk.rewrite.enabled", "true")
  }
}
