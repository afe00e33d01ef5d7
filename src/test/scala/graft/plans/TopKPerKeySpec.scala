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
}
