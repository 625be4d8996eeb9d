package graft.ext

import graft.core.Chain
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract / frame-sample run
  * as partition-batched functions (the Scala analogue of `mapInPandas` —
  * one iterator per partition, vectorizable by the caller).
  *
  * The actual codec step is a STUB (`fakeDecode`): image/audio libraries
  * are not available in this environment, so it derives deterministic
  * pseudo-metadata from the byte stream. The Spark-side contract — schema,
  * binary transport, partition iteration, explode of per-frame rows — is
  * real and tested; swap `fakeDecode` for a JNI/javacv decoder in
  * production.
  */
object Multimodal {

  /** Deterministic stand-in for a real media decoder. The format branch
    * keys off the first CHARACTER's Unicode code point (not the first UTF-8
    * byte) so it agrees with character-level SQL (`ascii(substr(text,1,1))`)
    * even when the payload starts with a multi-byte character (zh docs).
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, String, Int) = {
    val len = bytes.length
    val head =
      if (len == 0) 0
      else new String(bytes, 0, math.min(len, 4),
        java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
    val width = 64 + (len % 576)          // plausible 64..639
    val height = 64 + ((len * 7) % 416)   // plausible 64..479
    val format = if (head % 2 == 0) "png" else "jpeg"
    val nFrames = 1 + (len % 8)
    (width, height, format, nFrames)
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))
}

final class MultimodalOps(private val c: Chain) extends AnyVal {
  import Multimodal._

  /** Attach a binary media column derived from a source column (ingest
    * shim: in production this is the raw image/audio payload).
    */
  def withMediaColumn(sourceCol: String, as: String = "media"): Chain =
    c.next("with_media", c.df.withColumn(as, col(sourceCol).cast("binary")), None)

  /** decode_media(media): partition-batched decode of the binary column to
    * a metadata struct. Uses mapPartitions — one JVM-side batch per
    * partition, no per-row task overhead, no driver involvement.
    */
  def decodeMedia(mediaCol: String): Chain = {
    val inSchema = c.df.schema
    val outSchema = StructType(inSchema.fields ++ metaSchema.fields)
    val idx = inSchema.fieldIndex(mediaCol)
    val enc = RowEncoder.encoderFor(outSchema)
    val df2 = c.df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val (w, h, fmt, nf) = fakeDecode(bytes)
        Row.fromSeq(row.toSeq ++ Seq(bytes.length, w, h, fmt, nf))
      }
    }(enc)
    c.next("decode_media", df2, None)
  }

  /** frame_sample(every): one output row per sampled frame index —
    * explode-based, distributed, no skew beyond frame counts.
    */
  def frameSample(every: Int = 1): Chain = {
    val df2 = c.df.withColumn("frame_idx",
      explode(sequence(lit(0), col("n_frames") - 1, lit(every))))
    c.next("frame_sample", df2, None)
  }
}
