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
    import org.apache.hadoop.fs.Path
    // Resolve the directory from the catalog while the entry still exists;
    // fall back to the default warehouse layout for the orphaned-directory
    // case (in-memory catalog lost the entry but a previous JVM's files
    // remain). Hadoop FileSystem handles any warehouse scheme (file/hdfs/
    // s3a), unlike java.io.File.
    val loc = scala.util.Try(
        new Path(spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tableName))
          .location))
      .getOrElse(new Path(spark.conf.get("spark.sql.warehouse.dir"),
        tableName.toLowerCase(java.util.Locale.ROOT)))
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }
}
