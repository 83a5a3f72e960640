package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extract run as a
  * per-partition batch operator (the Scala analogue of `mapInPandas`) so a
  * real decoder library would amortize model/codec init per partition, not
  * per row.
  *
  * The decode step itself is a clearly-marked deterministic STUB (no
  * image/audio libs in this container); the Spark-side plumbing — schema,
  * binary encoding, batch shape, partition-level init — is real and tested.
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
        val bytes = r.getAs[Array[Byte]](1)
        val (frames, mean, feat) = decodeStub(bytes)
        Row(id, bytes.length.toLong, frames, mean, feat)
      }
    }(enc)
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
