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

  /** resize_media(media, w, h, resizer): partition-batched re-encode of
    * the binary column at target dimensions through a pluggable
    * [[MediaResizer]] — binary in, binary out (the payload REPLACES the
    * original in-place), plus stamped `width`/`height`/`byte_len`
    * metadata for the new payload. Null/corrupt payloads resize from
    * empty bytes (the decoder contract: never kill the scan). Same
    * mapPartitions shape as [[decodeMedia]]: the resizer ships in the
    * closure once per task, rows stream through with no driver
    * involvement — at 100 TB this is the embarrassingly-parallel step.
    */
  def resizeMedia(mediaCol: String, width: Int, height: Int,
                  resizer: MediaResizer = FakeResizer): Chain = {
    require(width > 0 && height > 0,
      s"resize_media needs positive dimensions, got ${width}x$height")
    // re-STAMPS metadata: any prior width/height/byte_len (e.g. from a
    // preceding decodeMedia) is replaced, not duplicated — decode →
    // filter → resize chains keep one authoritative set of dimensions
    val base = c.df.drop("width", "height", "byte_len")
    val inSchema = base.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("byte_len", IntegerType, nullable = false)))
    val idx = inSchema.fieldIndex(mediaCol)
    val enc = RowEncoder.encoderFor(outSchema)
    val df2 = base.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val out = resizer.resize(
          if (bytes == null) Array.emptyByteArray else bytes, width, height)
        Row.fromSeq(row.toSeq.updated(idx, out) ++ Seq(width, height, out.length))
      }
    }(enc)
    c.next("resize_media", df2, None)
  }

  /** extract_features(media, dim, extractor): partition-batched embedding
    * of the binary column — the encoder step of a multimodal curation
    * pipeline, producing an `array<float>` column (`features`) that feeds
    * the ANN / semantic-dedup family directly (annBruteForce,
    * dedupEmbeddingNear, clusterEmbeddings). Pluggable
    * [[FeatureExtractor]]: production wraps an ONNX/JNI encoder and
    * batches inside the partition iterator; the deterministic fake keeps
    * the schema/transport contract oracle-checked. Null payloads embed
    * from empty bytes — a present, well-formed vector, never a null that
    * would poison downstream distance kernels.
    */
  def extractFeatures(mediaCol: String, dim: Int,
                      extractor: FeatureExtractor = FakeFeatureExtractor): Chain = {
    require(dim > 0, s"extract_features needs dim > 0, got $dim")
    val base = c.df.drop("features") // re-embed replaces a prior vector
    val inSchema = base.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val idx = inSchema.fieldIndex(mediaCol)
    val enc = RowEncoder.encoderFor(outSchema)
    val df2 = base.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val f = extractor.extract(
          if (bytes == null) Array.emptyByteArray else bytes, dim)
        Row.fromSeq(row.toSeq :+ f.toSeq)
      }
    }(enc)
    c.next("extract_features", df2, None)
  }
}
