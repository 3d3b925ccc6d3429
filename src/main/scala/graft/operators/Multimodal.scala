package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image / audio / video) columns for the training-data
  * pipeline: media content travels as an opaque `binary` column next to a
  * typed metadata struct, and every transform is either pure column
  * algebra (metadata math, frame sampling — stays in whole-stage codegen)
  * or a batched `mapPartitions` over a typed `Dataset` (the decode /
  * feature-extract hop, mirroring the Arrow-batch shape a Pandas-UDF
  * pipeline would use).
  *
  * The reference pipeline has no media handling (SURVEY.md §2.E); this is
  * the north-star extension surface (SURVEY.md §7.2 step 9). The actual
  * byte-level codecs (JPEG decode, PCM resample, H.264 frame extraction)
  * need native libraries that are absent from this container, so
  * [[Multimodal.StubCodec]] is a clearly-marked deterministic fake; the
  * Spark-side plumbing — schema, binary transport, batch shape,
  * partitioning — is real and exercised by the DuckDB oracle.
  *
  * Scale notes (100 TB): content bytes are never shuffled by these
  * operators — decode/feature-extract is a narrow per-partition map, and
  * downstream joins/aggregations run on the extracted (small) features
  * only. Frame sampling multiplies row counts by `duration/interval`;
  * callers should re-partition after a high-fan-out sample, not before.
  */
object Multimodal {

  /** Typed metadata carried next to the binary payload. Zero (not null)
    * marks a field that does not apply to the modality — keeps the struct
    * non-nullable and the oracle arithmetic total.
    */
  final case class MediaMeta(
      width: Int,        // image, video
      height: Int,       // image, video
      duration_ms: Long, // audio, video
      sample_rate: Int)  // audio

  /** One media object: opaque bytes + typed metadata. */
  final case class MediaRow(
      doc_id: Long,
      media_type: String, // image | audio | video
      content: Array[Byte],
      meta: MediaMeta)

  /** Decoder output: header fields a real codec would parse, plus a
    * fixed-width feature vector (the "embedding" of the media object).
    */
  final case class DecodedRow(
      doc_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      n_bytes: Long,
      features: Array[Double])

  /** Feature-vector width produced by the codec. */
  val FeatureDim = 8

  // =========================================================================
  // Media table — deterministic binary + metadata derived from `documents`
  // =========================================================================

  /** Attach a binary content column and modality metadata to the
    * `documents` table. Deterministic pure-column derivation (UTF-8 bytes
    * of the text as the payload; metadata from `doc_id`/`n_chars`) so the
    * whole media pipeline is reproducible in the DuckDB oracle. In
    * production this DataFrame comes straight off parquet with a real
    * `binary` column — everything downstream is agnostic to where the
    * bytes came from.
    */
  def mediaTable(documents: DataFrame): DataFrame = {
    val id    = col("doc_id")
    val mtype = element_at(
      array(lit("image"), lit("audio"), lit("video")), (id % 3 + 1).cast("int"))
    val visual = mtype =!= "audio"
    val timed  = mtype =!= "image"
    documents.select(
      id,
      mtype.as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        when(visual, (lit(160) + (id % 8) * 80)).otherwise(0).cast("int").as("width"),
        when(visual, (lit(90) + (id % 6) * 60)).otherwise(0).cast("int").as("height"),
        when(timed, lit(1000) + (col("n_chars") % 120) * 250).otherwise(0L)
          .cast("long").as("duration_ms"),
        when(mtype === "audio", lit(8000) + (id % 4) * 8000).otherwise(0)
          .cast("int").as("sample_rate")).as("meta"))
  }

  /** DuckDB mirror of [[mediaTable]] (for oracle CTEs). */
  val sqlMediaTable: String =
    """SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  length(text) AS c_chars, text,
      |  CASE WHEN doc_id % 3 <> 1 THEN 160 + (doc_id % 8) * 80 ELSE 0 END AS width,
      |  CASE WHEN doc_id % 3 <> 1 THEN 90 + (doc_id % 6) * 60 ELSE 0 END AS height,
      |  CASE WHEN doc_id % 3 <> 0 THEN 1000 + (n_chars % 120) * 250 ELSE 0 END AS duration_ms,
      |  CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 4) * 8000 ELSE 0 END AS sample_rate
      |FROM documents""".stripMargin

  // =========================================================================
  // Decode / feature-extract — batched mapPartitions over typed rows
  // =========================================================================

  /** Batch decoder contract. A batch is handed to the codec whole (same
    * shape as one Arrow record batch under `mapInPandas`), so a real
    * implementation can amortize native-library setup and vectorize.
    */
  trait MediaCodec extends Serializable {
    def decodeBatch(batch: Seq[MediaRow]): Seq[DecodedRow]
  }

  /** STUB codec — deterministic fake standing in for the real image/audio
    * libraries this container does not have. "Decoding" passes the header
    * metadata through and derives the feature vector from the md5 of the
    * content bytes: dim i is the i-th 16-bit slice of the digest, centered
    * and scaled to [-1, 1). Exactly mirrored by [[featureCol]] /
    * [[sqlFeature]] so the oracle can validate the mapPartitions plumbing
    * end-to-end. A real codec replaces `decodeBatch` only; schema, batch
    * shape and partitioning are unchanged.
    */
  object StubCodec extends MediaCodec {
    override def decodeBatch(batch: Seq[MediaRow]): Seq[DecodedRow] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { r =>
        md.reset()
        val hex = md.digest(r.content).map(b => f"$b%02x").mkString
        val features = Array.tabulate(FeatureDim) { i =>
          (Integer.parseInt(hex.substring(i * 4, i * 4 + 4), 16) - 32768) / 32768.0
        }
        DecodedRow(r.doc_id, r.media_type, r.meta.width, r.meta.height,
          r.content.length.toLong, features)
      }
    }
  }

  /** Run the codec over a media DataFrame ([[mediaTable]] schema) as a
    * narrow per-partition map in fixed-size batches. No shuffle, binary
    * stays inside the partition, output is the small decoded schema.
    */
  def decodeBatched(
      media: DataFrame, codec: MediaCodec, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("media_type"), col("content"), col("meta"))
      .as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(codec.decodeBatch))
      .toDF()
  }

  /** Pure-column mirror of the [[StubCodec]] feature formula: dim `i` of
    * the feature vector from the md5 hex of `content`. `(v - 32768)/32768`
    * with v a 16-bit integer is exact in double (power-of-two divisor), so
    * Spark, the codec JVM path and DuckDB agree bit-for-bit.
    */
  def featureCol(content: Column, i: Int): Column = {
    val hex = md5(content)
    val v = (0 until 4).map { k =>
      hexNibble(substring(hex, i * 4 + 1 + k, 1)) * (1 << (4 * (3 - k)))
    }.reduce(_ + _)
    (v - 32768) / lit(32768.0)
  }

  private def hexNibble(c: Column): Column = {
    val a = ascii(c)
    when(a <= 57, a - 48).otherwise(a - 87)
  }

  /** DuckDB rendering of [[featureCol]] over a text column `t`. */
  def sqlFeature(t: String, i: Int): String = {
    def nib(k: Int) = {
      val pos = i * 4 + 1 + k
      s"(CASE WHEN ascii(substr(md5($t), $pos, 1)) <= 57 THEN ascii(substr(md5($t), $pos, 1)) - 48 ELSE ascii(substr(md5($t), $pos, 1)) - 87 END)"
    }
    val v = (0 until 4).map(k => s"${nib(k)} * ${1 << (4 * (3 - k))}").mkString(" + ")
    s"(($v) - 32768) / 32768.0"
  }

  // =========================================================================
  // Resize — exact integer aspect-fit on metadata
  // =========================================================================

  /** Aspect-preserving fit of (width, height) into (maxW, maxH), appended
    * as `out_w`/`out_h`. Pure integer arithmetic (no float scale factor)
    * so every engine computes identical dimensions; a real resize kernel
    * would consume these target dims per batch in the codec. Non-visual
    * rows (width or height 0) pass through as 0×0. Never upscales.
    */
  def resizeFit(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    val fits = w <= maxW && h <= maxH
    val wide = w * maxH >= h * maxW // limited by width
    df
      .withColumn("out_w",
        when(w === 0 || h === 0, 0)
          .when(fits, w)
          .when(wide, maxW)
          .otherwise((w * maxH) / h).cast("int"))
      .withColumn("out_h",
        when(w === 0 || h === 0, 0)
          .when(fits, h)
          .when(wide, (h * maxW) / w)
          .otherwise(maxH).cast("int"))
  }

  /** DuckDB mirror of [[resizeFit]] — two SELECT-list expressions. */
  def sqlResizeFit(maxW: Int, maxH: Int): (String, String) = (
    s"""CAST(CASE WHEN width = 0 OR height = 0 THEN 0
       |  WHEN width <= $maxW AND height <= $maxH THEN width
       |  WHEN width * $maxH >= height * $maxW THEN $maxW
       |  ELSE (width * $maxH) // height END AS INTEGER)""".stripMargin,
    s"""CAST(CASE WHEN width = 0 OR height = 0 THEN 0
       |  WHEN width <= $maxW AND height <= $maxH THEN height
       |  WHEN width * $maxH >= height * $maxW THEN (height * $maxW) // width
       |  ELSE $maxH END AS INTEGER)""".stripMargin)

  // =========================================================================
  // Frame sampling — explode(sequence) on metadata, no byte access
  // =========================================================================

  /** One row per sampled frame for timed media: frames at
    * `0, interval, 2·interval, … ≤ duration`. Pure generate — Spark plans
    * this as a pipelined `GenerateExec` (same operator class as the
    * reference's genre explode, configmap:182), no shuffle. The byte-level
    * frame grab would happen in a downstream codec batch keyed by
    * (doc_id, frame_ts_ms).
    */
  def frameSample(media: DataFrame, intervalMs: Long): DataFrame =
    media
      .filter(col("meta.duration_ms") > 0)
      .select(
        col("doc_id"),
        col("media_type"),
        explode(sequence(
          lit(0L), (col("meta.duration_ms") / lit(intervalMs)).cast("long")))
          .as("frame_idx"))
      .withColumn("frame_ts_ms", col("frame_idx") * intervalMs)
}
