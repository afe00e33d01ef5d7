package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement main for the optimization rounds — times sub-parts
  * of a query in isolation (noop sink). Edited per experiment; not part of
  * any declared surface.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val reps = 3
      var best = Double.MaxValue
      var r: Option[T] = None
      (1 to reps + 1).foreach { i =>
        val t0 = System.nanoTime()
        r = Some(f)
        val dt = (System.nanoTime() - t0) / 1e9
        if (i > 1 && dt < best) best = dt // first rep = warmup
      }
      println(f"[probe] $label%-40s ${best}%8.3f s")
      r.get
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.ops.stats.Stats
    import graft.queries.Tables
    val w = 65536
    val a = Tables.load(spark, sfDir, "lineitem").select(col("l_orderkey").as("k"))
    val b = Tables.load(spark, sfDir, "orders")
      .where(col("o_orderstatus") === "F").select(col("o_orderkey").as("k"))

    time("cms regs a (lineitem)") { noop(Stats.cmsRegisters(a, col("k"), d = 4, w = w)) }
    time("cms regs b (orders F)") { noop(Stats.cmsRegisters(b, col("k"), d = 4, w = w)) }
    time("exact side") {
      noop(a.groupBy("k").agg(count(lit(1)).as("ca"))
        .join(b.groupBy("k").agg(count(lit(1)).as("cb")), "k")
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("exact_join_size")))
    }
    time("full q_join_card_est") {
      noop(graft.queries.Relational.qJoinCardEst(spark, sfDir))
    }
    spark.stop()
  }
}
