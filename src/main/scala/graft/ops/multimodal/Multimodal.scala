package graft.ops.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travel as opaque
  * `binary` columns with typed metadata alongside.
  *
  * The decode itself is STUBBED (no image/audio libs in this container) with
  * a deterministic fake derived from the bytes — but the Spark-side shape is
  * real: binary schema, per-partition batch decoding (the Scala analogue of
  * an Arrow-batched pandas UDF), metadata struct contract, partition sizing.
  * Swap `decodeStub` for a real codec and nothing else changes.
  */
object Multimodal {

  /** Typed metadata produced by the (stubbed) decoder. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Deterministic fake decode: metadata derived only from the byte content.
    * A real implementation would parse the media header here.
    */
  def decodeStub(bytes: Array[Byte]): Row = {
    val n = bytes.length.toLong
    // ??? real codec goes here — deterministic fake below
    val w = (n % 640).toInt
    val h = ((n * 31) % 480).toInt
    Row(n, w, h, "img/fake")
  }

  /** Attaches a binary `media` column (UTF-8 bytes of `textCol` — the test
    * stand-in for real media payloads) plus decoded metadata.
    *
    * Decoding runs per partition over an iterator (batch-shaped, like
    * `mapInPandas`): codecs amortise init cost across the partition, and
    * partitions stay bounded by `spark.sql.files.maxPartitionBytes`, so
    * executor memory is safe however large the table is.
    */
  def withMediaMetadata(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val withBin = df.select(col(idCol), encode(col(textCol), "UTF-8").as("media"))
    val outSchema = StructType(withBin.schema.fields :+ StructField("meta", MetaSchema, nullable = false))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    withBin.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        Row.fromSeq(r.toSeq :+ decodeStub(bytes))
      }
    }(encoder)
  }
}
