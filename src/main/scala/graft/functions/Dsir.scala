package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.NativeExpressions

/** DSIR data selection (Xie et al., "Data Selection for Language Models
  * via Importance Resampling", NeurIPS'23): hashed-ngram bucket models
  * of a target domain vs the raw pool, per-document importance weights
  * as exact integer bit-length log-ratios (no float logs — both engines
  * agree bit-for-bit), selection by cumulative histogram.
  *
  * Split into the three reusable stages so the BATCH pipeline (train λ
  * and score the pool in two passes — `q_dsir_weight` /
  * `q_dsir_select`) and the STREAMING ingest (score each micro-batch
  * against a PERSISTED λ table —
  * [[graft.streaming.Pipelines.dsirScoreIngest]]) share one set of
  * semantics:
  *
  *  - [[features]]: doc → hashed unigram+bigram bucket stream. Pure
  *    map-side (native shingles expression, one explode).
  *  - [[lambdaTable]]: the ≤ `buckets`-row λ model from a labeled
  *    feature stream — ONE groupBy over B buckets, totals ride a
  *    window over the B-row model. `dense = true` materializes all B
  *    buckets (smoothed λ for buckets the training pool never hit) so
  *    a persisted table scores unseen-bucket features instead of
  *    silently dropping them — the streaming-ingest configuration.
  *  - [[scoreFeatures]] / [[scoreDocs]]: broadcast the tiny λ table
  *    onto the feature stream, one doc-keyed aggregation. Nothing
  *    grows with corpus size except the linear scans.
  */
object Dsir {

  /** Hashed-ngram model width shared by the catalog queries and the
    * streaming ingest.
    */
  val DefaultBuckets: Int = 1024

  /** (id, carry…, uni, bkt) hashed unigram+bigram feature stream:
    * one row per token and per adjacent token bigram, `uni` marking
    * unigrams (tokens carry no whitespace), `bkt` the md5 hash bucket.
    */
  def features(
      docs: DataFrame,
      id: String,
      text: String,
      carry: Seq[String] = Nil,
      buckets: Int = DefaultBuckets): DataFrame = {
    val keep: Seq[Column] = col(id) +: carry.map(col)
    docs
      .select(keep :+ TextFunctions.tokens(col(text)).as("tk"): _*)
      .select(keep :+ explode(concat(col("tk"),
        NativeExpressions.shingles(col("tk"), 2, distinct = false))).as("g"): _*)
      .select(keep :+
        (!col("g").like("% %")).as("uni") :+
        pmod(conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long"),
          lit(buckets.toLong)).as("bkt"): _*)
  }

  /** The λ table (bkt, lam_bits) from a feature stream carrying a
    * boolean `tgt` column: lam_bits = ⌊log₂ p̂_target(bkt)⌋ −
    * ⌊log₂ p̂_raw(bkt)⌋ with add-one-per-bucket smoothing, computed as
    * exact integer bit lengths. With `dense = true` every bucket in
    * [0, buckets) gets a row (counts 0 where unseen) — required when
    * the table is persisted and later applied to data that may hash
    * into buckets the training pool never produced.
    */
  def lambdaTable(
      feats: DataFrame,
      buckets: Int = DefaultBuckets,
      dense: Boolean = true): DataFrame = {
    val m0 = feats.groupBy(col("bkt")).agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("cr"))
    val model =
      if (!dense) m0
      else feats.sparkSession.range(buckets).select(col("id").as("bkt"))
        .join(m0, Seq("bkt"), "left")
        .select(col("bkt"),
          coalesce(col("ct"), lit(0L)).as("ct"),
          coalesce(col("cr"), lit(0L)).as("cr"))
    val wAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    model
      .withColumn("nt", sum(col("ct")).over(wAll))
      .withColumn("nr", sum(col("cr")).over(wAll))
      .select(col("bkt"),
        ((length(expr("bin(ct + 1)")) - length(expr(s"bin(nt + $buckets)"))) -
          (length(expr("bin(cr + 1)")) - length(expr(s"bin(nr + $buckets)"))))
          .cast("long").as("lam_bits"))
  }

  /** Per-doc weights from a feature stream and a λ table: broadcast
    * join + one doc-keyed aggregation → (id, n_feats, n_toks,
    * dsir_bits).
    *
    * The join is INNER, so features hashing into buckets absent from
    * `lam` are dropped from every count — correct only when the λ table
    * covers every reachable bucket: a DENSE table (the [[lambdaTable]]
    * default), or in-sample scoring where the features being scored are
    * a subset of the features λ was trained on (the batch catalog
    * queries). Out-of-sample callers with a sparse λ must use
    * [[scoreDocs]], which enforces density (ADVICE r8: a doc whose
    * tokens all hash to unseen buckets would otherwise vanish from the
    * output entirely).
    */
  def scoreFeatures(feats: DataFrame, lam: DataFrame, id: String): DataFrame =
    feats
      .join(broadcast(lam), Seq("bkt"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_feats"),
        sum(when(col("uni"), 1L).otherwise(0L)).as("n_toks"),
        sum(col("lam_bits")).as("dsir_bits"))

  /** [[features]] + [[scoreFeatures]] in one call — the micro-batch
    * scoring path (λ trained elsewhere and persisted). The docs being
    * scored are out-of-sample by construction here, so the λ table MUST
    * be dense (every bucket in [0, buckets) present — the smoothed
    * zero-count rows are what score unseen-bucket features); enforced
    * with a bounded count over the ≤ buckets-row model.
    */
  def scoreDocs(
      docs: DataFrame,
      lam: DataFrame,
      id: String,
      text: String,
      buckets: Int = DefaultBuckets): DataFrame = {
    val lamRows = lam.limit(buckets + 1).count()
    require(lamRows == buckets,
      s"scoreDocs requires a DENSE lambda table ($buckets rows, one per " +
        s"bucket — lambdaTable(dense = true)); got $lamRows rows. A sparse " +
        "table silently drops docs whose features hash into unseen buckets.")
    scoreFeatures(features(docs, id, text, Nil, buckets), lam, id)
  }
}
