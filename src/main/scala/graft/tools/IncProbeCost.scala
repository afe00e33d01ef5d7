package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the multi-probe knob of [[graft.ops.ann.Ann.cosineIncrement]] on
  * a real fixture: times the increment (vec_id%10 batch vs srpIndex of the
  * rest) with multi-probe ON and OFF, plus each run's pair count — the
  * measured basis for the increment's candidate-budget default (the same
  * protocol that priced cosinePairsLsh's ×14 degrade in r14/r15).
  */
object IncProbeCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.queries.Tables.load(spark, sfDir, "embeddings")
    val batch = e.where(pmod(col("vec_id"), lit(10)) === 0)
    val index = graft.ops.ann.Ann
      .srpIndex(e.where(pmod(col("vec_id"), lit(10)) =!= 0)).localCheckpoint()
    Seq(true, false).foreach { mp =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        // maxCandidates=0: this tool MEASURES the two routes' raw
        // economics to SET the default budget — pricing must not reroute
        // the thing being measured
        val n = graft.ops.ann.Ann
          .cosineIncrement(batch, index, 0.45, multiProbe = mp,
            maxCandidates = 0L).count()
        println(f"[incprobe] multiProbe=$mp rep$r: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s, $n pairs")
      }
    }
    spark.stop()
  }
}
