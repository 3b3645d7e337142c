package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video
  * carried as opaque `binary` columns with typed metadata, decoded and
  * feature-extracted in batch per partition.
  *
  * The actual codecs (JPEG/PNG/audio) are NOT in this container, so
  * `decodeStub` is a clearly-marked deterministic fake — but everything
  * Spark-side is real and tested: the schema (binary payload + metadata
  * struct), the `mapPartitions` batch shape (the JVM analogue of a
  * `mapInPandas` batch UDF: one iterator per partition, amortized setup —
  * where a real decoder would be initialized once per partition, not per
  * row), partitioning, and the frame-sampling explode.
  *
  * At 100 TB: payloads dominate I/O, so every query prunes to (id, payload)
  * at the scan; feature extraction is embarrassingly parallel per partition;
  * output features are small fixed-width rows that shuffle cheaply.
  */
object Multimodal {

  case class Media(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      mean_byte: Double, byte_entropy: Double, checksum: Long,
      feature_vec: Array[Float])

  /** Deterministic media table derived from `documents`: payload = UTF-8
    * bytes of the text (standing in for encoded image/audio bytes), kind
    * cycled by id, metadata derived from the payload hash. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(spark, Tables.documents(spark, dir))
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(xxhash64(col("text")), lit(1024)) + 64).cast("int").as("width"),
        (pmod(xxhash64(col("text"), lit(1)), lit(768)) + 64).cast("int").as("height"))

  // ----------------------------------------------------------- decode stub
  /** STUB: a real implementation would decode the payload with an image or
    * audio codec here (library absent in this container). The fake is
    * deterministic in the payload bytes so tests are stable. */
  def decodeStub(payload: Array[Byte]): (Double, Double, Long, Array[Float]) = {
    val hist = new Array[Long](256)
    var sum = 0L
    var checksum = 1469598103934665603L // FNV-1a 64 offset
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xFF
      hist(b) += 1
      sum += b
      checksum = (checksum ^ b) * 1099511628211L
      i += 1
    }
    val n = math.max(1, payload.length)
    val mean = sum.toDouble / n
    var entropy = 0.0
    var j = 0
    while (j < 256) {
      if (hist(j) > 0) {
        val p = hist(j).toDouble / n
        entropy -= p * math.log(p) / math.log(2)
      }
      j += 1
    }
    // fake 8-dim "embedding": coarse byte-histogram buckets, L1-normalized
    val vec = Array.tabulate(8) { k =>
      var s = 0L
      var b = k * 32
      while (b < (k + 1) * 32) { s += hist(b); b += 1 }
      (s.toDouble / n).toFloat
    }
    (mean, entropy, checksum, vec)
  }

  /** Batch feature extraction: one decoder lifecycle per PARTITION (the
    * mapPartitions contract), not per row. */
  def extractFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select("media_id", "kind", "payload", "width", "height")
      .as[Media]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec handles, buffers)
        it.map { m =>
          val (mean, entropy, checksum, vec) = decodeStub(m.payload)
          MediaFeatures(m.media_id, m.kind, m.payload.length, r6(mean),
            r6(entropy), checksum, vec)
        }
      }
      .toDF()
  }

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  /** Registry-facing projection of [[extractFeatures]]: the raw
    * `feature_vec` array is summarized as `hash(feature_vec)` + its size
    * (the driver's rows-compare cannot sort an array column — same pattern
    * as `TextFunctions.winnowQuery`). The full vectors stay available via
    * the [[extractFeatures]] API. */
  def featuresQuery(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir)
      .select(col("media_id"), col("kind"), col("n_bytes"), col("mean_byte"),
        col("byte_entropy"), col("checksum"),
        hash(col("feature_vec")).as("feature_fp"),
        size(col("feature_vec")).as("n_features"))

  /** Frame sampling: slice the payload into fixed-size "frames" (video
    * decode analogue), explode to one row per sampled frame, fingerprint
    * each. Every step is a built-in expression except the slicing itself. */
  def frameSample(spark: SparkSession, dir: String, frameBytes: Int = 256,
      stride: Int = 2): DataFrame = {
    import spark.implicits._
    val frames = mediaTable(spark, dir)
      .filter(col("kind") === "video")
      .select("media_id", "kind", "payload", "width", "height")
      .as[Media]
      .flatMap { m =>
        val n = m.payload.length
        val starts = 0 until n by (frameBytes * stride)
        starts.zipWithIndex.map { case (s, idx) =>
          val frame = java.util.Arrays.copyOfRange(m.payload, s, math.min(n, s + frameBytes))
          (m.media_id, idx, frame.length, frame)
        }
      }
      .toDF("media_id", "frame_idx", "frame_bytes", "frame")
    frames
      .withColumn("frame_fp", xxhash64(col("frame")))
      .drop("frame")
  }

  /** Resize, stubbed at the codec layer: a real implementation decodes,
    * rescales pixels, re-encodes. The deterministic fake keeps every
    * `stride`-th byte (a nearest-neighbor downsample of the byte stream) and
    * rewrites the metadata accordingly — exercising the real pipeline shape:
    * binary in → smaller binary out → metadata update, batch per partition. */
  def resizeStub(payload: Array[Byte], stride: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) { out(i) = payload(i * stride); i += 1 }
    out
  }

  def resize(spark: SparkSession, dir: String, stride: Int = 4): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select("media_id", "kind", "payload", "width", "height")
      .as[Media]
      .mapPartitions { it =>
        it.map { m =>
          val small = resizeStub(m.payload, stride)
          Media(m.media_id, m.kind, small,
            math.max(1, m.width / stride), math.max(1, m.height / stride))
        }
      }
      .toDF()
      .select(col("media_id"), col("kind"), length(col("payload")).as("n_bytes"),
        col("width"), col("height"), xxhash64(col("payload")).as("payload_fp"))
  }

  /** Metadata/feature summary per kind — the query a curation pipeline runs
    * to monitor a multimodal corpus. */
  def mediaSummary(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir)
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_media"),
        round(avg("n_bytes"), 6).as("avg_bytes"),
        round(avg("mean_byte"), 6).as("avg_mean_byte"),
        round(avg("byte_entropy"), 6).as("avg_entropy"),
        countDistinct(col("checksum")).as("distinct_payloads"))
}
