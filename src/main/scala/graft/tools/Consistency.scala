package graft.tools
import org.apache.spark.sql.SparkSession
object Consistency {
  def main(args: Array[String]): Unit = {
    val qk = graft.SparkEntry.queries.keySet
    val ok = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${qk.size} oracles=${ok.size} rowsOnly=${(qk -- ok).toSeq.sorted.mkString(",")}")
    val orphans = ok -- qk
    println(s"orphan oracles (BAD if non-empty): ${orphans.mkString(",")}")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows=$n (must be > 0)")
    spark.stop()
  }
}
