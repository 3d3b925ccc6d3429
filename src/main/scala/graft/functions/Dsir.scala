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
      dense: Boolean = true): DataFrame =
    lambdaFromCounts(
      feats.groupBy(col("bkt")).agg(
        sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("tgt"), 0L).otherwise(1L)).as("cr")),
      buckets, dense)

  /** [[lambdaTable]]'s smoothing/bit-length core over pre-aggregated
    * per-bucket counts `(bkt, ct, cr)` — shared with the one-scan
    * [[trainAndScore]] path, whose counts arrive via the compact
    * per-(doc, bucket) table rather than raw feature rows.
    */
  private def lambdaFromCounts(
      m0: DataFrame,
      buckets: Int,
      dense: Boolean): DataFrame = {
    val model =
      if (!dense) m0
      else m0.sparkSession.range(buckets).select(col("id").as("bkt"))
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

  /** One-SCAN train-and-score: the in-sample batch path (train λ on the
    * whole pool, score the non-target slice) reading the corpus ONCE.
    * [[lambdaTable]] + [[scoreFeatures]] each consume the raw feature
    * stream, so composing them tokenizes, md5-hashes, and explodes the
    * corpus twice; here both the λ aggregation and the per-doc score
    * read ONE compact per-(id, bucket, uni) count table, and the two
    * consumers' identical aggregation subplans dedupe into a single
    * exchange via Catalyst's ReusedExchange (spec-pinned on the final
    * adaptive plan). Result == `scoreFeatures(feats.filter(!tgt),
    * lambdaTable(feats))` bit-for-bit (spec-pinned).
    *
    * THE TRADE — measure before choosing: the saved second scan costs a
    * shuffle of the compact table, which at B buckets is ~every gram
    * row (map-side reduction only collapses in-doc repeats of the same
    * bucket). On fast local columnar storage the re-scan is cheaper
    * than the shuffle — the two-pass composition measured 2× FASTER at
    * sf10 (3.6 s vs 7.2 s) and is what the catalog queries use. Prefer
    * this one-scan shape when the scan side is the expensive one:
    * remote object storage, decode-heavy formats, or a feature stream
    * that is itself costly to recompute.
    */
  def trainAndScore(
      feats: DataFrame,
      id: String,
      buckets: Int = DefaultBuckets): DataFrame = {
    // the compact table's exact shape is what makes the reuse fire, so
    // two deliberate choices:
    //  - `tgt` rides as an AGGREGATE (max over per-doc-identical
    //    values), NOT a grouping key — were it a key, Catalyst would
    //    push the scoring side's `!tgt` filter below the aggregate and
    //    the two consumers' exchange subtrees would differ;
    //  - `uni` IS a grouping key, NOT a `sum(when(uni,...))` aggregate —
    //    the λ consumer has no use for a unigram count, so a per-group
    //    n_uni aggregate would be pruned from λ's copy of the subtree
    //    (different partial aggregates ⇒ different exchanges ⇒ no
    //    reuse); as a key it survives in both copies identically, and
    //    the per-doc token count is recovered as sum(n) over uni rows
    val compact = feats
      .groupBy(col(id), col("bkt"), col("uni"))
      .agg(max(col("tgt")).as("tgt"), count(lit(1)).as("n"))
    val lam = lambdaFromCounts(
      compact.groupBy(col("bkt")).agg(
        sum(when(col("tgt"), col("n")).otherwise(0L)).as("ct"),
        sum(when(col("tgt"), 0L).otherwise(col("n"))).as("cr")),
      buckets, dense = true)
    compact
      .filter(!col("tgt"))
      .join(broadcast(lam), Seq("bkt"))
      .groupBy(col(id))
      .agg(sum(col("n")).as("n_feats"),
        sum(when(col("uni"), col("n")).otherwise(0L)).as("n_toks"),
        sum(col("n") * col("lam_bits")).as("dsir_bits"))
  }

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
