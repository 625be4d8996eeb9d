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
  * The codec is a pluggable [[MediaDecoder]]: [[ImageHeaderDecoder]] is a
  * real pure-JVM PNG/JPEG/GIF/BMP header parser; [[FakeDecoder]] is the
  * deterministic stand-in used for the driver's non-media payloads (kept
  * as the default so the oracle exercises the full Spark-side contract —
  * schema, binary transport, partition iteration, per-frame explode — in
  * an environment with no media fixtures).
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("audio_format", StringType, nullable = false)))
}

final class MultimodalOps(private val c: Chain) extends AnyVal {
  import Multimodal._

  /** Attach a binary media column derived from a source column (ingest
    * shim: in production this is the raw image/audio payload).
    */
  def withMediaColumn(sourceCol: String, as: String = "media"): Chain =
    c.next("with_media", c.df.withColumn(as, col(sourceCol).cast("binary")), None)

  /** decode_media(media, decoder): partition-batched decode of the binary
    * column to a metadata struct through a pluggable [[MediaDecoder]].
    * Uses mapPartitions — one JVM-side batch per partition, no per-row
    * task overhead, no driver involvement; the decoder instance ships in
    * the closure once per task, not per row.
    */
  def decodeMedia(mediaCol: String, decoder: MediaDecoder = FakeDecoder): Chain = {
    val inSchema = c.df.schema
    val outSchema = StructType(inSchema.fields ++ metaSchema.fields)
    val idx = inSchema.fieldIndex(mediaCol)
    val enc = RowEncoder.encoderFor(outSchema)
    val df2 = c.df.mapPartitions { it =>
      it.map { row =>
        // null payloads degrade to `unknown`, same contract as corrupt bytes:
        // an undecodable cell must never kill the scan
        val bytes = row.getAs[Array[Byte]](idx)
        val m = decoder.decode(if (bytes == null) Array.emptyByteArray else bytes)
        val blen = if (bytes == null) 0 else bytes.length
        Row.fromSeq(row.toSeq ++ Seq(blen, m.width, m.height, m.format, m.nFrames))
      }
    }(enc)
    c.next("decode_media", df2, None)
  }

  /** decode_audio(media, decoder): the audio sibling of [[decodeMedia]] —
    * partition-batched header decode to (sample_rate, channels,
    * bits_per_sample, n_samples, duration_ms, audio_format).
    * `duration_ms` is exact integer arithmetic (n_samples × 1000 / rate),
    * zero for undecodable payloads.
    */
  def decodeAudio(mediaCol: String, decoder: AudioDecoder = AudioHeaderDecoder): Chain = {
    val inSchema = c.df.schema
    val outSchema = StructType(inSchema.fields ++ Multimodal.audioMetaSchema.fields)
    val idx = inSchema.fieldIndex(mediaCol)
    val enc = RowEncoder.encoderFor(outSchema)
    val df2 = c.df.mapPartitions { it =>
      it.map { row =>
        // null payloads degrade to `unknown`, same contract as corrupt bytes
        val bytes = row.getAs[Array[Byte]](idx)
        val m = decoder.decode(if (bytes == null) Array.emptyByteArray else bytes)
        val blen = if (bytes == null) 0 else bytes.length
        val durMs = if (m.sampleRate > 0) m.nSamples * 1000L / m.sampleRate else 0L
        Row.fromSeq(row.toSeq ++ Seq(blen, m.sampleRate, m.channels,
          m.bitsPerSample, m.nSamples, durMs, m.format))
      }
    }(enc)
    c.next("decode_audio", df2, None)
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
