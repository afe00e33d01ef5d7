package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-data table loader. The driver generates TPC-H-ish parquet under
  * /root/testdata/sf0.001 … sf0.1 (see TESTDATA.md); every query receives
  * the sf dir.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Schema-adaptive event-time column: the driver has shipped `events.ts`
    * as parquet TIMESTAMP(NANOS) (read as epoch-nano BIGINT under
    * `spark.sql.legacy.parquet.nanosAsLong`) and as TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ); a production events feed could carry any of
    * these. Every event-time query goes through this one conversion so a
    * schema change in the source can never fan out into per-query breaks:
    *   - integral `ts` → interpreted as epoch nanoseconds;
    *   - TIMESTAMP_NTZ  → reinterpreted in the session zone (sessions run
    *     UTC, so the stored micros value is preserved bit-for-bit);
    *   - TIMESTAMP      → passed through.
    * The result is always classic TimestampType, so downstream window /
    * date_trunc / interval logic sees ONE type regardless of the source.
    */
  def eventTs(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => timestamp_micros(expr("ts div 1000"))
    case TimestampNTZType => col("ts").cast(TimestampType)
    case _                => col("ts")
  }

  /** Events table with `ts` normalised to TimestampType (see [[eventTs]]). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.withColumn("ts", eventTs(raw))
  }
}
