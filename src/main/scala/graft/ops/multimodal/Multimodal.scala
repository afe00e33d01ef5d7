package graft.ops.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travel as opaque
  * `binary` columns with typed metadata alongside.
  *
  * Image payloads have a REAL decode path (in-JDK `javax.imageio`, header
  * read only — enable with `graft.multimodal.realCodec=true`), and
  * WAV/RIFF audio payloads a real header sniff ([[decodeWav]], pure JVM);
  * other media and unrecognised bytes fall back to a deterministic fake
  * derived from the byte content (no media libs in this container). Either way the
  * Spark-side shape is identical: binary schema, per-partition batch
  * decoding (the Scala analogue of an Arrow-batched pandas UDF), metadata
  * struct contract, partition sizing. Swap the codec and nothing else
  * changes.
  */
object Multimodal {

  /** Typed metadata produced by the decoder. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Deterministic fake decode: metadata derived only from the byte content.
    * The stand-in for codecs this container lacks (audio/video); image
    * bytes take [[decodeImage]] when the real-codec flag is on.
    */
  def decodeStub(bytes: Array[Byte]): Row = {
    val n = bytes.length.toLong
    val w = (n % 640).toInt
    val h = ((n * 31) % 480).toInt
    Row(n, w, h, "img/fake")
  }

  /** Real image decode via in-JDK `javax.imageio`: format sniffed from the
    * header, dimensions read from the header ONLY (`reader.getWidth(0)`
    * never materialises pixel data, so a corrupt tail or a 100 MB payload
    * costs the same as a thumbnail). None for bytes no installed reader
    * recognises — the caller falls back to the deterministic stub, so a
    * mixed media column degrades per-row, not per-query.
    */
  def decodeImage(bytes: Array[Byte]): Option[Row] =
    try {
      // a direct memory-cached stream, NOT ImageIO.createImageInputStream:
      // the factory defaults to a disk-backed cache, which creates and
      // deletes a temp FILE per payload — pure I/O overhead for bytes that
      // are already in memory (it also consults the stream SPI registry
      // per call). Reader behaviour over the stream is identical.
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      if (iis == null) None
      else try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            Some(Row(bytes.length.toLong, reader.getWidth(0), reader.getHeight(0),
              "img/" + reader.getFormatName.toLowerCase))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real audio-header sniff for WAV/RIFF payloads (pure JVM — RIFF is a
    * length-prefixed chunk walk, no codec needed): finds the `fmt ` chunk
    * and reports sample rate and channel count through the fixed
    * [[MetaSchema]] as `width`=sampleRate, `height`=channels,
    * `format`="audio/wav" (the schema is the contract; the mapping is
    * documented here). Header-only like [[decodeImage]] — sample data is
    * never touched, so payload size doesn't matter. None for anything
    * that is not a well-formed RIFF/WAVE header, including truncated or
    * adversarial chunk sizes — per-row fallback, never a query failure.
    */
  def decodeWav(bytes: Array[Byte]): Option[Row] =
    try {
      def ascii(o: Int) = new String(bytes, o, 4, "US-ASCII")
      def le16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def le32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      if (bytes.length < 36 || ascii(0) != "RIFF" || ascii(8) != "WAVE") None
      else {
        // chunk walk from offset 12: [id:4][size:4][payload:size (word-aligned)]
        var off = 12L
        var res: Option[Row] = None
        var ok = true
        while (ok && res.isEmpty && off + 8 <= bytes.length) {
          val o = off.toInt
          val sz = le32(o + 4)
          if (ascii(o) == "fmt " && sz >= 16 && off + 8 + 16 <= bytes.length) {
            val channels = le16(o + 10)
            val sampleRate = le32(o + 12)
            if (channels > 0 && sampleRate > 0 && sampleRate <= Int.MaxValue)
              res = Some(Row(bytes.length.toLong, sampleRate.toInt, channels, "audio/wav"))
            else ok = false
          }
          off += 8 + sz + (sz & 1) // Long arithmetic: a 0xFFFFFFFF chunk
          // size steps past the buffer and ends the walk, never overflows
        }
        res
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The `data` chunk of a RIFF/WAVE payload: (offset, length) of the raw
    * PCM bytes, or None for anything that is not a well-formed WAV. The
    * declared chunk size is CLAMPED to the buffer — streamed WAVs
    * conventionally declare 0xFFFFFFFF when the length is unknown at
    * header-write time, and a truncated file should still expose the PCM
    * it has (per-row fallback, never a query failure). Same chunk-walk
    * hardening as [[decodeWav]].
    */
  def pcmSection(bytes: Array[Byte]): Option[(Int, Int)] =
    try {
      def ascii(o: Int) = new String(bytes, o, 4, "US-ASCII")
      def le32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      if (bytes.length < 36 || ascii(0) != "RIFF" || ascii(8) != "WAVE") None
      else {
        var off = 12L
        var res: Option[(Int, Int)] = None
        while (res.isEmpty && off + 8 <= bytes.length) {
          val o = off.toInt
          val sz = le32(o + 4)
          if (ascii(o) == "data") {
            val avail = bytes.length - (o + 8)
            res = Some((o + 8, math.min(sz, avail.toLong).toInt))
          }
          off += 8 + sz + (sz & 1)
        }
        res
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** A canonical 44-byte streaming WAV header (PCM, 8-bit, mono by
    * default): RIFF and data sizes are 0xFFFFFFFF — the streamed-WAV
    * convention for "length unknown at header-write time", which
    * [[pcmSection]] clamps to the actual buffer. Lets a query wrap any
    * byte payload as well-formed WAV with ONE constant literal (no
    * per-row size arithmetic), and is the header a real PCM streamer
    * would emit.
    */
  def wavHeaderStreaming(sampleRate: Int = 8000, channels: Short = 1,
                         bitsPerSample: Short = 8): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val blockAlign = (channels * bitsPerSample / 8).toShort
    bb.put("RIFF".getBytes("US-ASCII")).putInt(0xffffffff)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign).putShort(bitsPerSample)
      .put("data".getBytes("US-ASCII")).putInt(0xffffffff)
    bb.array()
  }

  /** A complete 24-bit uncompressed (BI_RGB) BMP of the given dimensions
    * with zeroed pixel rows — BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER
    * (40 B) + height 4-byte-aligned rows. BMP is the pure-integer image
    * container (fixed-offset little-endian header, no CRC, no entropy
    * coding), so a payload built here is (a) readable by the in-JDK
    * ImageIO BMP reader — a REAL codec round-trip — and (b) byte-size
    * predictable by closed-form arithmetic (54 + rowSize·h, rowSize =
    * ((3w+3)/4)·4), which is what lets the C90 oracle check the real
    * decode with plain SQL.
    */
  def bmpBytes(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0,
      s"bmpBytes: dimensions must be positive (got $width x $height)")
    val rowSize = ((3 * width + 3) / 4) * 4
    val dataSize = rowSize * height
    val fileSize = 54 + dataSize
    val bb = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)          // reserved, data offset
      .putInt(40).putInt(width).putInt(height)     // BITMAPINFOHEADER
      .putShort(1).putShort(24)                    // planes, bpp
      .putInt(0).putInt(dataSize)                  // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
    bb.array()                                     // pixel rows stay zero
  }

  /** A complete 8-bit grayscale PNG of the given dimensions with zeroed
    * pixel rows — the OTHER pure-integer image container beside
    * [[bmpBytes]]: big-endian length-prefixed chunks with CRC32 trailers
    * (signature, IHDR, IDAT, IEND). The IDAT zlib stream uses STORED
    * deflate blocks (BTYPE=00) instead of compression, which keeps the
    * total byte size closed-form — raw = h·(w+1) filter+pixel bytes,
    * n_bytes = 63 + 5·ceil(raw/65535) + raw — while remaining a fully
    * valid PNG the in-JDK ImageIO reader decodes end-to-end (CRCs and
    * the adler32 checksum are real). That closed form is what lets the
    * C91 oracle check the real decode with plain SQL, exactly like
    * C90's BMP arithmetic.
    */
  def pngBytes(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0,
      s"pngBytes: dimensions must be positive (got $width x $height)")
    val raw = height * (width + 1)          // per row: filter byte 0 + w gray bytes
    val nBlocks = (raw + 65534) / 65535     // stored deflate blocks, 64 KiB - 1 each
    val idatLen = 2 + 5 * nBlocks + raw + 4 // zlib hdr + block hdrs + data + adler
    val bb = java.nio.ByteBuffer.allocate(8 + 25 + (12 + idatLen) + 12) // big-endian
    bb.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      bb.putInt(data.length).put(tpe.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tpe.getBytes("US-ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(width).putInt(height)
      .put(8.toByte).put(0.toByte)          // bit depth 8, grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    chunk("IHDR", ihdr.array())
    val idat = java.nio.ByteBuffer.allocate(idatLen)
    idat.put(0x78.toByte).put(0x01.toByte)  // zlib: deflate/32K window, no dict
    var rem = raw
    while (rem > 0) {
      val blk = math.min(rem, 65535)
      rem -= blk
      idat.put(if (rem == 0) 1.toByte else 0.toByte) // BFINAL | BTYPE=00
      // stored-block LEN/NLEN are 16-bit LITTLE-endian inside the deflate
      // stream even though every PNG-level integer is big-endian
      idat.putShort(java.lang.Short.reverseBytes(blk.toShort))
      idat.putShort(java.lang.Short.reverseBytes((~blk).toShort))
      idat.position(idat.position() + blk)  // zero scanlines: buffer pre-zeroed
    }
    // adler32 of `raw` zero bytes in closed form: s1 stays 1, s2 = raw mod 65521
    idat.putInt(((raw % 65521) << 16) | 1)
    chunk("IDAT", idat.array())
    chunk("IEND", Array.emptyByteArray)
    bb.array()
  }

  /** A complete minimal RIFF/AVI video of the given dimensions — the
    * VIDEO container counterpart of [[bmpBytes]]/[[pngBytes]]/
    * [[wavHeaderStreaming]], and like them a genuine file, not a blob
    * with a magic number: `RIFF('AVI ')` holding `LIST(hdrl)` with a
    * full 56-byte AVIMAINHEADER (`avih`) and one `LIST(strl)` video
    * stream (56-byte `strh` 'vids'/'DIB ' + 40-byte BITMAPINFOHEADER
    * `strf`), then `LIST(movi)` with `frames` uncompressed 24-bit BI_RGB
    * `00db` frame chunks of zeroed pixel rows. Every field is a
    * fixed-offset little-endian integer (no CRC, no entropy coding), so
    * total byte size is closed-form — n_bytes = 224 + frames·(8 + ds),
    * ds = ((3w+3)/4)·4·h — which is what lets the C93 oracle check the
    * real container walk with plain SQL, exactly like C89's WAV walk
    * and C90's BMP arithmetic.
    */
  def aviBytes(width: Int, height: Int, frames: Int,
               usPerFrame: Int = 33333, fill: Int = -1): Array[Byte] = {
    require(width > 0 && height > 0 && frames > 0 && usPerFrame > 0,
      s"aviBytes: dimensions/frames/rate must be positive " +
        s"(got $width x $height x $frames @ $usPerFrame)")
    val rowSize = ((3 * width + 3) / 4) * 4
    val ds = rowSize * height                    // bytes per BI_RGB frame
    val moviSz = 4 + frames * (8 + ds)           // 'movi' + frame chunks
    val total = 224 + frames * (8 + ds)
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(total - 8); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(192); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)  // rate, maxBps, pad, flags
      .putInt(frames).putInt(0).putInt(1).putInt(ds)     // total, initial, streams, sugBuf
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)           // dwReserved[4]
    fourcc("LIST"); bb.putInt(116); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    bb.putInt(0).putInt(0).putInt(0)                     // flags, prio+lang, initial
      .putInt(usPerFrame).putInt(1000000)                // scale/rate = frame period
      .putInt(0).putInt(frames).putInt(ds).putInt(-1).putInt(0) // start, len, sugBuf, quality, sampleSize
      .putShort(0).putShort(0)                           // rcFrame
      .putShort(width.toShort).putShort(height.toShort)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(width).putInt(height)           // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(ds)     // planes, bpp, BI_RGB, size
      .putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(moviSz); fourcc("movi")
    var f = 0
    while (f < frames) {
      fourcc("00db"); bb.putInt(ds)
      if (fill < 0) bb.position(bb.position() + ds)      // zero pixel rows
      else {                                             // frame f fills with
        val v = ((fill + f) & 0xff).toByte               // (fill+f) mod 256 —
        var p = 0                                        // content an oracle
        while (p < ds) { bb.put(v); p += 1 }             // prices in closed form
      }
      f += 1
    }
    bb.array()
  }

  /** The AVIMAINHEADER of a RIFF/AVI payload: (width, height, totalFrames,
    * microSecPerFrame), or None for anything that is not a well-formed AVI
    * container — the same hardened Long-arithmetic chunk walk as
    * [[decodeWav]] (an adversarial 4 GiB chunk size steps past the buffer
    * and ends the walk; truncated headers return None, never throw). This
    * is a REAL container parse: it descends `RIFF('AVI ')` →
    * `LIST(hdrl)` → `avih` by walking declared chunk sizes, so a payload
    * whose avih lives after other header chunks still parses and a
    * payload that merely starts with "RIFF" does not.
    */
  def aviHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] =
    try {
      def ascii(o: Int) = new String(bytes, o, 4, "US-ASCII")
      def le32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      if (bytes.length < 24 || ascii(0) != "RIFF" || ascii(8) != "AVI ") None
      else {
        var off = 12L
        var res: Option[(Int, Int, Int, Long)] = None
        while (res.isEmpty && off + 12 <= bytes.length) {
          val o = off.toInt
          val sz = le32(o + 4)
          if (ascii(o) == "LIST" && ascii(o + 8) == "hdrl") {
            // walk inside the hdrl list for the avih chunk
            var in = off + 12
            val end = math.min(off + 8 + sz, bytes.length.toLong)
            while (res.isEmpty && in + 8 <= end) {
              val io = in.toInt
              val isz = le32(io + 4)
              if (ascii(io) == "avih" && isz >= 56 && in + 8 + 56 <= end) {
                val uspf = le32(io + 8)
                val totalFrames = le32(io + 8 + 16)
                val w = le32(io + 8 + 32)
                val h = le32(io + 8 + 36)
                if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue &&
                    totalFrames <= Int.MaxValue)
                  res = Some((w.toInt, h.toInt, totalFrames.toInt, uspf))
                else in = end // malformed dims: abandon this hdrl
              }
              in += 8 + isz + (isz & 1)
            }
            if (res.isEmpty) off = bytes.length.toLong // one hdrl per file
          }
          off += 8 + sz + (sz & 1)
        }
        res
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** [[aviHeader]] through the fixed [[MetaSchema]] contract:
    * `width`/`height` from the AVIMAINHEADER, `format`="video/avi"
    * (frame count and rate don't fit the four-field schema — the C93
    * query reads them through [[aviMeta]]'s wider schema instead).
    */
  def decodeAvi(bytes: Array[Byte]): Option[Row] =
    aviHeader(bytes).map { case (w, h, _, _) =>
      Row(bytes.length.toLong, w, h, "video/avi") }

  /** (id, media) frame of synthetic AVI payloads whose dimensions, frame
    * count and frame rate all derive deterministically from the text's
    * UTF-8 byte length (w = 1 + len % maxW, h = 1 + len·31 % maxH,
    * frames = 1 + len·7 % maxF, usPerFrame = 10000·(1 + len % 5)) — the
    * C93 fixture builder: real container bytes with oracle-computable
    * metadata. NULL text maps to a NULL payload (stub zeros downstream,
    * the C90/C91 stance). Default dims are small because each frame is a
    * FULL uncompressed BI_RGB plane (the file is genuinely playable
    * structure, not a stub): payload ≤ 224 + maxF·(8 + 4·ceil(3·maxW/4)·
    * maxH) bytes — ≤ ~4.7 KB at the defaults — regardless of document
    * size.
    */
  def syntheticAvi(df: DataFrame, idCol: String, textCol: String,
                   maxW: Int = 16, maxH: Int = 12, maxF: Int = 8): DataFrame = {
    val in = df.select(col(idCol), col(textCol))
    val outSchema = StructType(Seq(in.schema.fields(0),
      StructField("media", BinaryType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val media =
          if (r.isNullAt(1)) null
          else {
            val len = r.getString(1).getBytes("UTF-8").length
            aviBytes(1 + len % maxW, 1 + ((len.toLong * 31) % maxH).toInt,
              1 + ((len.toLong * 7) % maxF).toInt, 10000 * (1 + len % 5),
              fill = len)
          }
        Row(r.get(0), media)
      }
    }(encoder)
  }

  /** REAL video frame extraction for uncompressed AVIs: walks
    * `RIFF('AVI ')` → `LIST(movi)` by declared chunk sizes and emits
    * each `00db`/`00dc` frame chunk's payload as (frame_idx, frame)
    * rows — and because a 'DIB ' stream's frames ARE raw BI_RGB pixel
    * planes, for that (fixture-real) case this is frame extraction with
    * NO codec at all: the end of the byte-chunk stand-in
    * ([[sampleFrames]]) for the container graft can actually build.
    * Compressed streams would hand these payloads to a codec — the
    * env-blocked remainder. Hardening as [[aviHeader]]: Long-arithmetic
    * walk, declared sizes clamped to the buffer, non-AVI payloads and
    * NULLs yield no frames (poison-row stance). Partition-local fan-out
    * like every decode here.
    */
  def aviFrames(df: DataFrame, idCol: String, binCol: String): DataFrame = {
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
        val frames = if (bytes == null) Vector.empty else aviMoviFrames(bytes)
        frames.iterator.zipWithIndex.map { case (fb, i) => Row(r.get(idIdx), i, fb) }
      }
    }(encoder)
  }

  /** The `movi` frame payloads of an AVI buffer, in container order —
    * empty for anything that is not a well-formed AVI. Shared walk
    * hardening with [[aviHeader]]/[[pcmSection]].
    */
  def aviMoviFrames(bytes: Array[Byte]): Vector[Array[Byte]] =
    try {
      def ascii(o: Int) = new String(bytes, o, 4, "US-ASCII")
      def le32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      if (bytes.length < 24 || ascii(0) != "RIFF" || ascii(8) != "AVI ") Vector.empty
      else {
        var off = 12L
        val out = Vector.newBuilder[Array[Byte]]
        var found = false
        while (!found && off + 12 <= bytes.length) {
          val o = off.toInt
          val sz = le32(o + 4)
          if (ascii(o) == "LIST" && ascii(o + 8) == "movi") {
            found = true
            var in = off + 12
            val end = math.min(off + 8 + sz, bytes.length.toLong)
            while (in + 8 <= end) {
              val io = in.toInt
              val isz = le32(io + 4)
              val id = ascii(io)
              if ((id == "00db" || id == "00dc") && isz > 0) {
                val avail = math.max(0L, end - (in + 8))
                val take = math.min(isz, avail).toInt
                if (take > 0)
                  out += java.util.Arrays.copyOfRange(bytes, io + 8, io + 8 + take)
              }
              in += 8 + isz + (isz & 1)
            }
          }
          off += 8 + sz + (sz & 1)
        }
        out.result()
      }
    } catch { case scala.util.control.NonFatal(_) => Vector.empty }

  /** Video-container metadata through a schema wide enough for the fields
    * AVI actually carries — (n_bytes, width, height, n_frames,
    * us_per_frame, format) per row, parsed by the REAL [[aviHeader]]
    * container walk; payloads that are not well-formed AVI (including
    * NULL → empty) degrade per row to the [[decodeStub]] arithmetic with
    * zero frames (one poison row never fails a corpus-scale job).
    * Partition-local like every decode here.
    */
  def aviMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("us_per_frame", LongType, nullable = false),
      StructField("format", StringType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes0 = r.getAs[Array[Byte]](binIdx)
        val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
        aviHeader(bytes) match {
          case Some((w, h, f, uspf)) =>
            Row(r.get(idIdx), bytes.length.toLong, w, h, f, uspf, "video/avi")
          case None =>
            val stub = decodeStub(bytes)
            Row(r.get(idIdx), stub.getLong(0), stub.getInt(1), stub.getInt(2),
              0, 0L, stub.getString(3))
        }
      }
    }(encoder)
  }

  /** (id, media) frame of synthetic BMP payloads whose dimensions derive
    * deterministically from the text's UTF-8 byte length (w = 1 + len %
    * maxW, h = 1 + len·31 % maxH) — the C90 fixture builder: real
    * container bytes with oracle-computable metadata. NULL text maps to
    * a NULL payload (the decode seam's poison-row stance: stub zeros).
    * Partition-local like every media op here; payloads are ≤ 54 +
    * 4·ceil(3·maxW/4)·maxH bytes regardless of document size, so the
    * media column is bounded however large the corpus rows are.
    */
  def syntheticBmp(df: DataFrame, idCol: String, textCol: String,
                   maxW: Int = 64, maxH: Int = 48): DataFrame =
    syntheticImage(df, idCol, textCol, maxW, maxH, bmpBytes)

  /** [[syntheticBmp]]'s PNG twin — same deterministic dimension derivation,
    * [[pngBytes]] payloads (the C91 fixture builder).
    */
  def syntheticPng(df: DataFrame, idCol: String, textCol: String,
                   maxW: Int = 64, maxH: Int = 48): DataFrame =
    syntheticImage(df, idCol, textCol, maxW, maxH, pngBytes)

  private def syntheticImage(df: DataFrame, idCol: String, textCol: String,
                             maxW: Int, maxH: Int,
                             build: (Int, Int) => Array[Byte]): DataFrame = {
    val in = df.select(col(idCol), col(textCol))
    val outSchema = StructType(Seq(in.schema.fields(0),
      StructField("media", BinaryType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val media =
          if (r.isNullAt(1)) null
          else {
            val len = r.getString(1).getBytes("UTF-8").length
            build(1 + len % maxW, 1 + ((len.toLong * 31) % maxH).toInt)
          }
        Row(r.get(0), media)
      }
    }(encoder)
  }

  /** PCM window sampling over the WAV decode seam: every `stride`-th
    * fixed-size byte window of the payload's `data` chunk as
    * (window_idx, window) rows — [[sampleFrames]] for audio, except the
    * walk genuinely parses the RIFF container first ([[pcmSection]]), so
    * a non-WAV payload yields no windows rather than fingerprinting
    * header garbage. NULL payloads yield no windows (the seam's poison-
    * row stance). Partition-local fan-out like every decode here.
    */
  def samplePcmWindows(df: DataFrame, idCol: String, binCol: String,
                       windowBytes: Int = 288, stride: Int = 1): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("window_idx", IntegerType, nullable = false),
      StructField("window", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val pcm = if (bytes == null) None else pcmSection(bytes)
        pcm match {
          case None => Iterator.empty
          case Some((off, len)) =>
            val nWin = len / (windowBytes * stride)
            (0 until nWin).iterator.map { i =>
              val s = off + i * windowBytes * stride
              Row(r.get(idIdx), i, java.util.Arrays.copyOfRange(bytes, s, s + windowBytes))
            }
        }
      }
    }(encoder)
  }

  /** Per-video motion profile from consecutive decoded frames: n_pairs,
    * total L1 byte change (Σ over adjacent frame pairs of Σ|a_i − b_i|),
    * the peak pair change, and the 6-dp mean — the STATIC-VIDEO detector
    * a media-curation pipeline runs before training (near-zero motion =
    * a slideshow/still padded into video: dedupe against the image
    * corpus instead of training as video; a single peak spike = a scene
    * cut). Frames come from the real [[aviFrames]] container walk; the
    * pair distance is one [[graft.functions.ByteDiff64]] codegen pass.
    *
    * Scale: frames shuffle ONCE on (id, frame_idx) for the
    * consecutive-pair self-join (equi-join on idx−1 — co-partitioned
    * with the groupBy after), then a keyed 3-aggregate; videos with
    * fewer than 2 frames have no motion definition and emit nothing.
    */
  def motionProfile(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val fr = aviFrames(df, idCol, binCol)
      .select(col(idCol), col("frame_idx"), col("frame"))
    val nxt = fr.select(col(idCol), (col("frame_idx") - 1).as("frame_idx"),
      col("frame").as("__next"))
    fr.join(nxt, Seq(idCol, "frame_idx"))
      .select(col(idCol),
        call_function("graft_bytediff", col("frame"), col("__next")).as("__m"))
      .groupBy(idCol).agg(
        count(lit(1)).as("n_pairs"),
        sum("__m").as("total_motion"),
        max("__m").as("peak_motion"))
      .withColumn("mean_motion",
        floor(col("total_motion").cast("double") / col("n_pairs")
          * lit(1000000) + lit(0.5)) / lit(1e6))
  }

  /** The whole PCM `data` section of each WAV payload as one binary
    * column — the per-clip twin of [[samplePcmWindows]] (same chunk
    * walk, no windowing): (id, pcm). Non-WAV and NULL payloads emit
    * nothing (the C88 door rule).
    */
  def pcmBytes(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("pcm", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val pcm = if (bytes == null) None else pcmSection(bytes)
        pcm.iterator.map { case (off, len) =>
          Row(r.get(idIdx), java.util.Arrays.copyOfRange(bytes, off, off + len))
        }
      }
    }(encoder)
  }

  /** Exact audio telemetry per WAV clip: n_samples, energy (Σ(s−128)²),
    * peak |s−128|, zero crossings, and 6-dp RMS — the loudness/clipping/
    * noisiness read a media-curation pipeline runs before training on
    * audio (silent clips: energy 0; clipped clips: peak 127; tonal vs
    * noisy: crossing rate). The container walk is [[pcmSection]] (real
    * RIFF), the stats one [[graft.functions.AudioStats64]] codegen pass
    * at scan speed — no shuffle anywhere, integer-exact by construction
    * (RMS is one sqrt of an exact ratio, floor(v·1e6+0.5)-quantized).
    */
  def audioStats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    pcmBytes(df, idCol, binCol)
      .select(col(idCol), call_function("graft_audiostats", col("pcm")).as("s"))
      .select(col(idCol),
        col("s")(0).as("n_samples"), col("s")(1).as("energy_u"),
        col("s")(2).as("peak"), col("s")(3).as("crossings"))
      .withColumn("rms", when(col("n_samples") > 0,
        floor(sqrt(col("energy_u").cast("double") / col("n_samples"))
          * lit(1000000) + lit(0.5)) / lit(1e6)))
  }

  /** Perceptual AUDIO near-dup pairs: media pairs sharing ≥ `minShared`
    * near-duplicate PCM windows — [[frameNearDup]]'s C4 machinery over
    * the WAV seam with [[graft.functions.AudioFp64]]'s band-energy
    * fingerprint instead of dHash: windows whose 9×8 band-energy
    * difference codes sit within `maxHamming` bits count as the same
    * audio content even when every BYTE differs (in-band sample
    * permutations leave energies — and the code — bit-identical; small
    * amplitude tweaks move few bits), which is exactly what exact-md5
    * dedup cannot see. Pigeonhole chunk banding (lossless), a df ≤
    * `maxDf` guard against boilerplate windows (silence, test tones),
    * only 64-bit codes ride the exchange.
    */
  def audioNearDup(df: DataFrame, idCol: String, binCol: String,
                   maxHamming: Int = 3, windowBytes: Int = 288, stride: Int = 1,
                   maxDf: Int = 50, minShared: Long = 2): DataFrame = {
    require(maxHamming <= 31, "banding needs chunks > maxHamming; 64 bits cap this at 31")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val fps = samplePcmWindows(df, idCol, binCol, windowBytes, stride)
      .select(col(idCol).as("id"),
        call_function("graft_audiofp64", col("window")).as("code64"))
      .distinct()
      .localCheckpoint()
    val dfc = fps.groupBy("code64").agg(count(lit(1)).as("dfc"))
    val kept = fps.join(dfc, "code64").where(col("dfc") <= maxDf)
      .select(col("id"), col("code64"))
    val nChunks = Seq(4, 8, 16, 32).find(_ > maxHamming).get
    val chunkLen = 64 / nChunks
    val mask = (1L << chunkLen) - 1
    val chunks = kept.select(col("id"), col("code64"),
      posexplode(array((0 until nChunks).map(c =>
        shiftrightunsigned(col("code64"), c * chunkLen).bitwiseAND(mask)): _*))
        .as(Seq("cidx", "code")))
    val cand = chunks.as("x").join(chunks.as("y"),
        col("x.cidx") === col("y.cidx") && col("x.code") === col("y.code")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.code64").as("ca"), col("y.code64").as("cb"))
      .dropDuplicates("a", "b", "ca", "cb")
    cand
      .where(bit_count(col("ca").bitwiseXOR(col("cb"))) <= maxHamming)
      .groupBy("a", "b").agg(count(lit(1)).as("n_near"))
      .where(col("n_near") >= minShared)
      .orderBy("a", "b")
  }

  /** One row's decode under the resolved codec flag: image header, then
    * WAV header, then AVI header, then the deterministic stub.
    */
  private def decodeRow(bytes: Array[Byte], realCodec: Boolean): Row =
    if (realCodec)
      decodeImage(bytes).orElse(decodeWav(bytes)).orElse(decodeAvi(bytes))
        .getOrElse(decodeStub(bytes))
    else decodeStub(bytes)

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
        // NULL payload == empty payload: the FNV basis alone seeds the
        // pseudo-embedding, the row survives
        if (bytes != null) bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
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
        // a NULL payload yields no frames — one poison row must not kill
        // a corpus-scale job, and "no media, no frames" is the only
        // coherent semantic (the SQL twins' len(NULL) propagates the same)
        val nFrames = if (bytes == null) 0 else bytes.length / (frameBytes * stride)
        (0 until nFrames).iterator.map { i =>
          Row(r.get(idIdx), i, bytes.slice(i * frameBytes * stride,
            i * frameBytes * stride + frameBytes))
        }
      }
    }(encoder)
  }

  /** Perceptual frame near-dup pairs: media pairs sharing ≥ `minShared`
    * NEAR-duplicate frames — the dHash extension of the exact-md5 frame
    * dedup (C43). Each sampled frame ([[sampleFrames]], the batch-shaped
    * decode seam — a real decoder's luma grid slots in unchanged) hashes
    * to a 64-bit difference hash (graft.functions.DHash64: 9×8 grid,
    * right-neighbour brightness comparisons — pure integer arithmetic, so
    * the DuckDB twin reproduces it bit-for-bit), and frames within
    * `maxHamming` bits count as the same visual content even when bytes
    * differ (re-encode, small overlay, brightness-preserving noise).
    *
    * Pair search is the C4 SimHash machinery verbatim: pigeonhole chunk
    * banding (hamming ≤ h ⇒ some 64/nChunks-bit chunk equal — lossless),
    * so candidates come from chunk-equality joins, never all-pairs; only
    * 64-bit codes ride the exchange (frames/payloads never shuffle); a
    * per-code document-frequency guard (df ≤ `maxDf`) keeps boilerplate
    * frames (intros, test cards, black frames) from squaring a posting
    * list. `n_near` counts the distinct (code_a, code_b) near pairs
    * between two media — ≥ `minShared` of them certifies shared visual
    * sequence, not one lucky collision.
    */
  def frameNearDup(df: DataFrame, idCol: String, binCol: String,
                   maxHamming: Int = 3, frameBytes: Int = 72, stride: Int = 1,
                   maxDf: Int = 50, minShared: Long = 2): DataFrame = {
    require(maxHamming <= 31, "banding needs chunks > maxHamming; 64 bits cap this at 31")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // staged: the df guard and the banded join both consume the code set —
    // without the checkpoint the frame-sampling mapPartitions runs twice
    val fps = sampleFrames(df, idCol, binCol, frameBytes, stride)
      .select(col(idCol).as("id"),
        call_function("graft_dhash64", col("frame")).as("code64"))
      .distinct()
      .localCheckpoint()
    val dfc = fps.groupBy("code64").agg(count(lit(1)).as("dfc"))
    val kept = fps.join(dfc, "code64").where(col("dfc") <= maxDf)
      .select(col("id"), col("code64"))
    val nChunks = Seq(4, 8, 16, 32).find(_ > maxHamming).get
    val chunkLen = 64 / nChunks
    val mask = (1L << chunkLen) - 1
    val chunks = kept.select(col("id"), col("code64"),
      posexplode(array((0 until nChunks).map(c =>
        shiftrightunsigned(col("code64"), c * chunkLen).bitwiseAND(mask)): _*))
        .as(Seq("cidx", "code")))
    val cand = chunks.as("x").join(chunks.as("y"),
        col("x.cidx") === col("y.cidx") && col("x.code") === col("y.code")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.code64").as("ca"), col("y.code64").as("cb"))
      .dropDuplicates("a", "b", "ca", "cb")
    cand
      .where(bit_count(col("ca").bitwiseXOR(col("cb"))) <= maxHamming)
      .groupBy("a", "b").agg(count(lit(1)).as("n_near"))
      .where(col("n_near") >= minShared)
      .orderBy("a", "b")
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
        // (NULL payload resizes to empty, same poison-row stance as decode)
        val out =
          if (bytes == null) Array.emptyByteArray
          else Array.tabulate(bytes.length / factor)(i => bytes(i * factor))
        Row.fromSeq(r.toSeq :+ out)
      }
    }(encoder)
  }

  /** Attaches decoded metadata to an EXISTING binary column. The codec is
    * resolved once on the driver: explicit argument wins, else the session
    * conf `graft.multimodal.realCodec` (default false — the deterministic
    * stub, which every oracle assumes). With the real codec on, image
    * payloads decode through [[decodeImage]] and unrecognised bytes fall
    * back to the stub per row.
    *
    * Decoding runs per partition over an iterator (batch-shaped, like
    * `mapInPandas`): codecs amortise init cost across the partition, and
    * partitions stay bounded by `spark.sql.files.maxPartitionBytes`, so
    * executor memory is safe however large the table is.
    */
  def decodeMedia(df: DataFrame, binCol: String,
                  realCodec: Option[Boolean] = None): DataFrame = {
    val useReal = realCodec.getOrElse(
      df.sparkSession.conf.get("graft.multimodal.realCodec", "false").toBoolean)
    val outSchema = StructType(df.schema.fields :+ StructField("meta", MetaSchema, nullable = false))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        // NULL payload decodes like an empty one (stub metadata), so a
        // poison row degrades to unknown-media instead of an executor NPE
        Row.fromSeq(r.toSeq :+
          decodeRow(if (bytes == null) Array.emptyByteArray else bytes, useReal))
      }
    }(encoder)
  }

  /** Attaches a binary `media` column (UTF-8 bytes of `textCol` — the test
    * stand-in for real media payloads) plus decoded metadata; see
    * [[decodeMedia]] for the codec/partition contract.
    */
  def withMediaMetadata(df: DataFrame, idCol: String, textCol: String): DataFrame =
    decodeMedia(
      df.select(col(idCol), encode(col(textCol), "UTF-8").as("media")), "media")
}
