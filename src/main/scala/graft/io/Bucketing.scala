package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed-table support for co-located joins.
  *
  * Facts that join repeatedly on the same key (orders ⋈ lineitem on the
  * order key, edges ⋈ nodes on the node id) should be bucketed ONCE at
  * write time: both sides hash-partitioned into the same bucket count and
  * sorted within buckets, so every subsequent sort-merge join runs with NO
  * exchange and NO sort — at 100 TB that turns the dominant repeated
  * shuffle into a one-time write cost.
  */
object Bucketing {

  /** Writes `df` as a bucketed, in-bucket-sorted parquet table in the
    * session catalog. Joins between tables bucketed on their join keys with
    * equal bucket counts plan shuffle-free (verified in BucketingSpec).
    */
  def saveBucketed(df: DataFrame, tableName: String, bucketCol: String,
                   numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** Drops a managed table AND its warehouse directory. The in-memory
    * catalog is per-JVM, so a fresh session can find a previous JVM's
    * directory without the catalog entry — `overwrite` alone then fails.
    */
  def dropTable(spark: org.apache.spark.sql.SparkSession, tableName: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tableName)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (loc.exists()) rm(loc)
  }
}
