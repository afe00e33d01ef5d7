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

  /** Feature extraction from a binary media column: a deterministic
    * pseudo-embedding (splitmix64 of a byte-content hash per dimension,
    * scaled to [-1,1]) standing in for a real vision/audio encoder — the
    * downstream plumbing (array<float> column feeding graft.ops.ann) is the
    * real contract. Runs per partition like the decode, so a real encoder
    * batches the same way.
    */
  def fakeEmbed(df: DataFrame, binCol: String, dims: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        var h = 0xcbf29ce484222325L
        bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
        val v = Array.tabulate(dims) { i =>
          val m = graft.functions.SrpCodes.mix64(h + i)
          (m.toDouble / Long.MaxValue.toDouble).toFloat
        }
        Row.fromSeq(r.toSeq :+ v.toSeq)
      }
    }(encoder)
  }

  /** Frame sampling: every `stride`-th fixed-size byte window of the media
    * payload as `(frame_idx, frame_bytes)` rows — the plumbing of video
    * frame extraction (a real decoder would emit decoded frames here;
    * chunking the raw payload is the deterministic stand-in). One media row
    * fans out to many frame rows, partition-locally.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val nFrames = bytes.length / (frameBytes * stride)
        (0 until nFrames).iterator.map { i =>
          Row(r.get(idIdx), i, bytes.slice(i * frameBytes * stride,
            i * frameBytes * stride + frameBytes))
        }
      }
    }(encoder)
  }

  /** Resize stub: a deterministic downsample of the payload (every
    * `factor`-th byte) plus updated metadata — the byte-level stand-in for
    * an image resize, keeping the binary-in/binary-out contract.
    */
  def resize(df: DataFrame, binCol: String, factor: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("resized", BinaryType, nullable = false))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        // ??? real scaling goes here — deterministic byte decimation below
        val out = Array.tabulate(bytes.length / factor)(i => bytes(i * factor))
        Row.fromSeq(r.toSeq :+ out)
      }
    }(encoder)
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
