package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extract run as a
  * per-partition batch operator (the Scala analogue of `mapInPandas`) so
  * decoder/model init amortizes per partition, not per row.
  *
  * IMAGE decode is REAL (`decodeImages`): PNG/JPEG through the JDK's
  * `javax.imageio` — no external codec jar needed — with magic-byte
  * sniffing and a never-throw fallback for unknown/corrupt payloads.
  * AUDIO decode is REAL too (`decodeAudio`, r6): WAV/PCM through the JDK's
  * `javax.sound.sampled`, same batch shape and fallback contract.
  * VIDEO feature extraction (`extractFeatures`) remains a clearly-marked
  * deterministic STUB (no video codec libs in this container); its
  * Spark-side plumbing — schema, binary encoding, batch shape,
  * partition-level init — is real and tested.
  */
object MultimodalOps {

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("mean_byte", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false),
  ))

  /** STUB decoder: stands in for e.g. JPEG decode + CNN feature extraction.
    * Deterministic pure function of the bytes: frame count = ceil(len/1024),
    * mean byte value, and an 8-dim byte-histogram "feature". Swap the body
    * for a real codec; the operator shape (binary in, struct+vector out,
    * batched per partition) is the contract.
    */
  private def decodeStub(bytes: Array[Byte]): (Long, Long, Array[Float]) = {
    val n = bytes.length.toLong
    val frames = (n + 1023) / 1024
    var sum = 0L
    val hist = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      hist(b >>> 5) += 1
      i += 1
    }
    val mean = if (n == 0) 0L else sum / n
    (frames, mean, hist.map(h => if (n == 0) 0f else h.toFloat / n))
  }

  /** Batch feature extraction over a binary column. One "decoder init" per
    * partition (where a real pipeline loads the codec/model).
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val input = df.select(col(idCol).cast("long").as("doc_id"), col(binCol).as("payload"))
    val enc = Encoders.row(frameSchema)
    input.mapPartitions { rows =>
      // real pipeline: val decoder = Codec.load() — once per partition
      rows.map { r =>
        val id = r.getLong(0)
        val bytes0 = r.getAs[Array[Byte]](1)
        val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
        val (frames, mean, feat) = decodeStub(bytes)
        Row(id, bytes.length.toLong, frames, mean, feat)
      }
    }(enc)
  }

  // ---- real image decode (JDK-only, javax.imageio) -----------------------

  val imageSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false), // png | jpeg | unknown
    StructField("width", IntegerType, nullable = false), // -1 when undecodable
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    /** Per-channel pixel-value sums (raster band order — R,G,B for RGB
      * images): exact integers, so a lossless codec round-trip is
      * oracle-checkable in SQL against the closed-form pixel function.
      */
    StructField("chan_sum", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n_bytes", LongType, nullable = false),
  ))

  /** Container sniff by magic bytes — decides which decoder runs (and keeps
    * arbitrary binary payloads on the cheap fallback path, no throw-driven
    * control flow inside the hot loop).
    */
  private def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      "png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff)
      "jpeg"
    else "unknown"

  /** REAL image decode over a binary column — PNG/JPEG payloads through the
    * JDK's `javax.imageio` (no external codec jar), per-partition batches
    * (the `mapInPandas` shape: decoder/SPI registry init amortizes per
    * partition, not per row). Emits dimensions, channel count, and exact
    * per-channel pixel sums from the decoded raster; unknown containers (or
    * corrupt payloads) fall back to `(-1, -1, 0, [])` with the byte length
    * — the operator never throws on bad data at 100 TB.
    */
  def decodeImages(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val input = df.select(col(idCol).cast("long").as("doc_id"), col(binCol).as("payload"))
    val enc = Encoders.row(imageSchema)
    input.mapPartitions { rows =>
      // per-partition init surface: ImageIO's reader SPI registry loads
      // here (a real pipeline would also pin codec/model instances)
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      rows.map { r =>
        val id = r.getLong(0)
        val bytes0 = r.getAs[Array[Byte]](1)
        val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
        def undecodable = Row(id, "unknown", -1, -1, 0, Seq.empty[Long], bytes.length.toLong)
        sniffFormat(bytes) match {
          case "unknown" => undecodable
          case fmt =>
            // NonFatal, not just IOException: the JDK JPEG/ICC decoders
            // throw RuntimeExceptions (CMMException, AIOOBE) on some
            // corrupt bodies with valid magic — all of them must take the
            // fallback row, never the task down
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) undecodable
            else {
              val raster = img.getRaster
              val w = img.getWidth
              val h = img.getHeight
              val bands = raster.getNumBands
              val sums = new Array[Long](bands)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  var b = 0
                  while (b < bands) { sums(b) += raster.getSample(x, y, b); b += 1 }
                  x += 1
                }
                y += 1
              }
              Row(id, fmt, w, h, bands, sums.toSeq, bytes.length.toLong)
            }
        }
      }
    }(enc)
  }

  /** Deterministic RGB test-image payloads (lossless PNG) for driving the
    * decode operator end-to-end: doc `d` is `(8 + d%5) × (6 + d%7)` with
    * pixel `(x,y)` channels `r=(31d+7x+13y)%256`, `g=(17d+5x+3y)%256`,
    * `b=(7d+11x+2y)%256` — closed forms a SQL oracle recomputes exactly
    * (SparkEntry m03 / OpsSpec). Encoded per partition with the JDK PNG
    * writer.
    */
  def renderTestImages(df: DataFrame, idCol: String): DataFrame =
    renderPayloads(df, idCol)(testImagePng)

  /** Shared scaffold of the deterministic payload renderers: id → binary
    * payload, batched per partition (encoder init amortizes like the
    * decoders').
    */
  private def renderPayloads(df: DataFrame, idCol: String)(
      render: Long => Array[Byte]): DataFrame = {
    val input = df.select(col(idCol).cast("long").as("doc_id"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = Encoders.row(schema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val d = r.getLong(0)
        Row(d, render(d))
      }
    }(enc)
  }

  /** The PNG payload of deterministic test image `d` (see renderTestImages). */
  def testImagePng(d: Long): Array[Byte] = {
    val w = (8 + d % 5).toInt
    val h = (6 + d % 7).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val raster = img.getRaster // band order R,G,B regardless of byte layout
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((31 * d + 7 * x + 13 * y) % 256).toInt)
        raster.setSample(x, y, 1, ((17 * d + 5 * x + 3 * y) % 256).toInt)
        raster.setSample(x, y, 2, ((7 * d + 11 * x + 2 * y) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ---- real audio decode (JDK-only, javax.sound.sampled) -----------------

  val audioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false), // wav | unknown
    StructField("channels", IntegerType, nullable = false), // -1 when undecodable
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    /** Exact per-channel PCM sample sums — like the image raster sums,
      * integer-exact for lossless PCM, so a SQL oracle can recompute them
      * from the closed-form sample function.
      */
    StructField("chan_sum", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n_bytes", LongType, nullable = false),
  ))

  /** RIFF/WAVE container sniff (bytes 0-3 "RIFF", 8-11 "WAVE"). */
  private def sniffAudio(b: Array[Byte]): String =
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else "unknown"

  /** REAL audio decode over a binary column — WAV/PCM payloads through the
    * JDK's `javax.sound.sampled` (no external codec jar): the platform
    * AudioFileReader parses the RIFF chunk structure and hands back the
    * format (channels / rate / sample width / endianness) plus the PCM
    * stream, which is summed per channel exactly. Same per-partition batch
    * shape and never-throw fallback contract as `decodeImages` — an
    * unknown container, a corrupt header, or an unsupported encoding
    * yields the `(-1, …, [])` row, never a task failure. 16-bit (either
    * endianness, signed) and 8-bit (signed or unsigned) PCM are summed;
    * anything else falls back.
    */
  def decodeAudio(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val input = df.select(col(idCol).cast("long").as("doc_id"), col(binCol).as("payload"))
    val enc = Encoders.row(audioSchema)
    input.mapPartitions { rows =>
      // per-partition init surface: the AudioFileReader SPI registry loads here
      rows.map { r =>
        val id = r.getLong(0)
        val bytes0 = r.getAs[Array[Byte]](1)
        val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
        def undecodable = Row(id, "unknown", -1, -1, -1L, Seq.empty[Long], bytes.length.toLong)
        if (sniffAudio(bytes) != "wav") undecodable
        else {
          val decoded =
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              try {
                val fmt = ais.getFormat
                val ch = fmt.getChannels
                val bits = fmt.getSampleSizeInBits
                val signed = fmt.getEncoding ==
                  javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
                val unsigned = fmt.getEncoding ==
                  javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
                val big = fmt.isBigEndian
                // gate on ENCODING too: ULAW/ALAW WAVs report bits=8 but
                // their code bytes are not PCM samples — they must take
                // the fallback, not be summed as if linear
                if (ch < 1 || !(signed || unsigned) || (bits != 16 && bits != 8)) None
                else {
                  val pcm = ais.readAllBytes()
                  val bytesPerSample = bits / 8
                  val frameBytes = ch * bytesPerSample
                  val frames = pcm.length / frameBytes
                  val sums = new Array[Long](ch)
                  var i = 0
                  while (i < frames) {
                    var c = 0
                    while (c < ch) {
                      val o = (i * ch + c) * bytesPerSample
                      val s =
                        if (bits == 16) { // no per-sample tuple allocation
                          if (big) ((pcm(o) << 8) | (pcm(o + 1) & 0xff)).toShort.toLong
                          else ((pcm(o + 1) << 8) | (pcm(o) & 0xff)).toShort.toLong
                        } else if (signed) pcm(o).toLong
                        else (pcm(o) & 0xff).toLong
                      sums(c) += s
                      c += 1
                    }
                    i += 1
                  }
                  Some(Row(id, "wav", ch, fmt.getSampleRate.toInt, frames.toLong,
                    sums.toSeq, bytes.length.toLong))
                }
              } finally ais.close()
            } catch {
              // UnsupportedAudioFileException on odd chunk layouts, plus
              // whatever RuntimeExceptions a corrupt header provokes in the
              // SPI readers — every one takes the fallback row
              case scala.util.control.NonFatal(_) => None
            }
          decoded.getOrElse(undecodable)
        }
      }
    }(enc)
  }

  /** Deterministic PCM16 WAV payloads for driving the audio decode
    * end-to-end: doc `d` is `1 + d%2` channels × `64 + d%33` frames at
    * 8 kHz, sample `(d, frame i, channel c) = ((211d + 31i + 97c + 128)
    * mod 4001) − 2000` — a closed form a SQL oracle recomputes exactly
    * (SparkEntry m04 / OpsSpec). Encoded per partition with the JDK WAV
    * writer.
    */
  def renderTestWavs(df: DataFrame, idCol: String): DataFrame =
    renderPayloads(df, idCol)(testWav)

  /** Closed-form sample value of test WAV `d` (see renderTestWavs). */
  def testWavSample(d: Long, i: Int, c: Int): Int =
    (((211 * d + 31 * i + 97 * c + 128) % 4001) - 2000).toInt

  /** The WAV payload of deterministic test clip `d`. */
  def testWav(d: Long): Array[Byte] = {
    val ch = (1 + d % 2).toInt
    val n = (64 + d % 33).toInt
    val pcm = new Array[Byte](n * ch * 2)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < ch) {
        val s = testWavSample(d, i, c)
        val o = (i * ch + c) * 2
        pcm(o) = (s & 0xff).toByte // little-endian
        pcm(o + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, ch, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Frame sampling: every `stride`-th frame index of a payload — the shape
    * of video frame-sampling (ids only; a real decoder would emit frames).
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, stride: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        ((length(col(binCol)) + 1023) / 1024).cast("long").as("n_frames"))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), greatest(col("n_frames") - 1, lit(0L)), lit(stride.toLong))))
      .select("doc_id", "frame_idx")
}
