package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Workflow-checkpoint save/load (reference: src/ketl/spark/utils.py:31-142).
  *
  * The reference estimates DataFrame size by sampling the RDD with Python
  * `sys.getsizeof` and repartitions to ~256 MB files — an extra job over the
  * data before every save. Here sizing is delegated to the engine: the
  * optimised plan's statistics (already maintained by Catalyst, zero extra
  * passes) pick the partition count, and `maxRecordsPerFile`-style splitting
  * is left to the writer. Same outcome — ~target-sized files — without
  * scanning the data twice.
  */
object Checkpoint {

  val TargetPartitionBytes: Long = 256L * 1024 * 1024

  /** `${base}/_SUCCESS`, the existence-check path for workflow engines
    * (reference: src/ketl/spark/utils.py:111 df_check_path).
    */
  def checkPath(basePath: String): String = s"$basePath/_SUCCESS"

  /** Strips a `/_SUCCESS` suffix back to the parquet base path
    * (reference: src/ketl/spark/utils.py:126 df_path).
    */
  def basePath(path: String): String =
    if (path != null && path.endsWith("/_SUCCESS")) path.dropRight("/_SUCCESS".length)
    else path

  /** Saves a checkpoint, choosing the partition count from the optimised
    * plan's size estimate (reference behaviour: src/ketl/spark/utils.py:31
    * df_save). Returns the possibly-repartitioned frame.
    */
  /** The stats-driven repartition shared by [[save]]/[[saveAs]]. Catalyst
    * reports `sizeInBytes = spark.sql.defaultSizeInBytes` (≈ Long.MaxValue)
    * for unsized sources — a count that would wrap `toInt` negative and in
    * any case means "size unknown", so such frames keep their current
    * partitioning instead of an absurd repartition.
    */
  private def sizedForWrite(df: DataFrame, targetPartitionBytes: Long): DataFrame = {
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes >= BigInt(Long.MaxValue) / 2) df
    else {
      val target = BigInt(targetPartitionBytes)
      val wanted = ((estBytes + target - 1) / target).max(1)
        .min(BigInt(Int.MaxValue)).toInt
      val current = df.rdd.getNumPartitions
      if (wanted < current) df.coalesce(wanted)
      else if (wanted > current) df.repartition(wanted)
      else df
    }
  }

  def save(df: DataFrame, path: String,
           targetPartitionBytes: Long = TargetPartitionBytes): DataFrame = {
    val out = sizedForWrite(df, targetPartitionBytes)
    out.write.mode("overwrite").parquet(basePath(path))
    out
  }

  /** Loads a checkpoint saved by [[save]] (reference: src/ketl/spark/utils.py:78
    * df_load). Accepts a check path or base path.
    */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(basePath(path))

  /** Hive-style partitioned write: one directory per value of
    * `partitionCols`. Readers filtering on those columns scan only the
    * matching directories (partition pruning) — the storage-layout lever
    * for time/tenant-sliced 100 TB tables, complementary to [[Bucketing]]
    * (pruning for filters; bucketing for joins).
    */
  def savePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(basePath(path))

  /** Format-parameterised checkpoint save/load for interop with non-parquet
    * estates. `orc` is the drop-in columnar alternative (predicate pushdown
    * + column pruning survive, spec-proven); `csv`/`json` are interchange
    * sinks (row formats — no pushdown, headers on for csv so the reference's
    * [[DataFrames.readTable]] defaults can read them back). Same
    * stats-driven partition sizing as [[save]].
    */
  def saveAs(df: DataFrame, path: String, format: String,
             targetPartitionBytes: Long = TargetPartitionBytes): DataFrame = {
    val out = sizedForWrite(df, targetPartitionBytes)
    val w = out.write.mode("overwrite")
    (if (format == "csv") w.option("header", "true") else w).format(format).save(basePath(path))
    out
  }

  /** Loads a checkpoint saved by [[saveAs]]. csv loads re-infer types (row
    * formats carry no schema; callers pin schemas with
    * [[DataFrames.castColumns]] when exactness matters).
    */
  def loadAs(spark: SparkSession, path: String, format: String): DataFrame = {
    val r = spark.read.format(format)
    (if (format == "csv") r.option("header", "true").option("inferSchema", "true") else r)
      .load(basePath(path))
  }
}
