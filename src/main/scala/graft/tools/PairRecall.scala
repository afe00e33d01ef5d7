package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pair-recall telemetry for the cosine-LSH dedup route (the r11 verdict's
  * open tuning item): measures recall / wall / candidate volume of
  * `cosinePairsLsh` configurations against the exact all-pairs set on the
  * embeddings table of SPARK_GRAFT_SF_DIR — the recall-vs-cost table that
  * tells a dedup pipeline which knob to turn (multi-probe vs more bands).
  * Args: [minCosine] (default 0.45, the dedup_embedding threshold).
  */
object PairRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val minCos = args.headOption.map(_.toDouble).getOrElse(0.45)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.ann.Ann
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    println(s"[pair-recall] corpus=$n minCosine=$minCos dir=$sfDir")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t0 = System.nanoTime()
    val exact = pairs(Ann.cosinePairs(e, minCos))
    println(f"[pair-recall] exact all-pairs: ${exact.size} pairs in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    def measure(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val s0 = System.nanoTime()
      val got = pairs(df)
      val secs = (System.nanoTime() - s0) / 1e9
      val fp = (got -- exact).size
      val recall = (got intersect exact).size.toDouble / math.max(1, exact.size)
      println(f"[pair-recall] $name: recall=$recall%.3f false_pos=$fp " +
        f"pairs=${got.size} wall=$secs%.1f s")
    }
    measure("single-probe b=16 (shipped default)",
      Ann.cosinePairsLsh(e, minCos))
    measure("single-probe b=32",
      Ann.cosinePairsLsh(e, minCos, bands = 32))
    measure("multi-probe  b=16",
      Ann.cosinePairsLsh(e, minCos, multiProbe = true))
    measure("multi-probe  b=8",
      Ann.cosinePairsLsh(e, minCos, bands = 8, multiProbe = true))
    measure("multi-probe  b=32",
      Ann.cosinePairsLsh(e, minCos, bands = 32, multiProbe = true))
    measure("single-probe b=64",
      Ann.cosinePairsLsh(e, minCos, bands = 64))
    spark.stop()
  }
}
