package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-data table loader. The driver generates TPC-H-ish parquet under
  * /root/testdata/sf0.001 … sf0.1 (see TESTDATA.md); every query receives
  * the sf dir.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
