package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Straggler-bound evidence for the depth-2 exact-percentile selection
  * route: times the single-group (worst-straggler) global-percentile
  * shape on the sf1 lineitem replica with (a) the single-level route and
  * (b) `maxRankRows` forced low enough that every target bucket recurses,
  * and asserts the two results are identical. At production scale the
  * default 10M threshold triggers the recursion exactly when a target
  * bucket would otherwise become one task's external sort.
  *
  *   SPARK_GRAFT_SF_DIR=target/testdata/sf1 \
  *     sbt -batch "runMain graft.tools.PercentileStress"
  */
object PercentileStress {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("all", lit("all"))
    val n = li.count()
    val pcts = Seq((0.5, "p50"), (0.95, "p95"), (0.99, "p99"), (0.999, "p999"))
    def run(label: String, maxRankRows: Long): Seq[org.apache.spark.sql.Row] = {
      (1 to 2).map { rep =>
        val t0 = System.nanoTime()
        val rows = graft.ops.stats.Stats.percentilesExact(
            li, "all", col("l_extendedprice"), pcts,
            fewGroupsHint = Some(true), maxRankRows = maxRankRows)
          .collect()
        println(f"[stress] $label rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        rows
      }.last.toSeq
    }
    println(s"[stress] lineitem rows: $n (target bucket ~ ${n / 100})")
    val flat = run("single-level ", Long.MaxValue)
    // force depth 2: every ~n/100-row target bucket exceeds the cap
    val deep = run(s"depth-2(cap=${n / 1000})", n / 1000)
    require(flat == deep, s"depth-2 diverged: $flat vs $deep")
    println("[stress] depth-2 result identical to single-level: OK")
    spark.stop()
  }
}
