package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming source builders (SURVEY.md §2.A).
  *
  * The engine's transforms only require a Kafka-shaped frame — a `value`
  * column castable to string (plus optional key/topic/offset metadata) —
  * so any of these sources feeds the same downstream pipeline:
  * Kafka in production, `MemoryStream` in tests, file sources for replay.
  */
object Sources {

  /** A1 — Kafka streaming source (reference:
    * k8s/spark-apps/kafka-spark-configmap.yaml:42-54, 156-167, 237-247).
    * `startingOffsets=earliest` mirrors the reference; extra options carry
    * security config (the reference passes SSL truststore settings).
    */
  def kafka(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest",
      extraOptions: Map[String, String] = Map.empty): DataFrame = {
    val b = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
    extraOptions.foldLeft(b) { case (bb, (k, v)) => bb.option(k, v) }.load()
  }

  /** File-based replay source: streams JSON-lines files as a Kafka-shaped
    * frame (`value: string`). Used for cold-path reprocessing (Kappa
    * replay, reference README.md:35-42) and as the test stand-in for A1.
    */
  def jsonLines(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .format("text")
      .load(path)
      .withColumnRenamed("value", "value")

  /** Batch flavor of [[jsonLines]] — same shape, for archive replay. */
  def jsonLinesBatch(spark: SparkSession, path: String): DataFrame =
    spark.read.format("text").load(path)

  // ---- A5: offline CSV samples (reference inputs/, FIXTURES.md §2) ----

  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  /** Reviews CSV sample (reference: inputs/reviews/steam_reviews_*.csv).
    * Quoted multiline review text requires `multiLine`; the appid lives in
    * the FILENAME, not a column, so the caller supplies it. Output is the
    * parsed-review shape (`SteamOps.parseReviews`), so the whole hot path
    * (sentiment window, review-bomb) runs unchanged over the offline data.
    * Review text goes through the producer's ingest cleaner (tag strip +
    * entity unescape + trim, reference: producers/steam_utils.py:38-42,167)
    * exactly as API-scraped reviews do before reaching Kafka.
    */
  def reviewsCsv(spark: SparkSession, path: String, appId: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("review_id", StringType),
      StructField("author", StringType),
      StructField("language", StringType),
      StructField("recommended", BooleanType),
      StructField("steam_purchase", BooleanType),
      StructField("votes_up", IntegerType),
      StructField("weighted_vote_score", FloatType),
      StructField("timestamp", TimestampType),
      StructField("review", StringType)))
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"") // RFC-4180 "" quote escaping, not backslash
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .schema(schema)
      .csv(path)
      .select(
        lit(appId).as("app_id"),
        col("review_id"),
        col("author").as("author_steamid"),
        col("language"),
        col("recommended"),
        col("votes_up"),
        col("weighted_vote_score"),
        col("timestamp"),
        graft.functions.TextFunctions.cleanReviewText(col("review")).as("review_text"))
  }

  /** Player-count CSV sample (reference: inputs/charts/steamcharts_24h.csv)
    * in the parsed-players shape (`SteamOps.parsePlayers`).
    */
  def chartsCsv(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("appid", IntegerType),
      StructField("timestamp", TimestampType),
      StructField("player_count", IntegerType)))
    spark.read
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .schema(schema)
      .csv(path)
  }
}
