package graft.model

import org.apache.spark.sql.types._

/** Input/output schemas of the reference pipeline (SURVEY.md §1.2, §1.3).
  *
  * The declared input schemas are intentionally NARROWER than what the
  * producers emit — `from_json` in permissive mode drops extra fields and
  * nulls missing ones (reference: k8s/spark-apps/kafka-spark-configmap.yaml:
  * 29-40, 148-154, 231-235; producer emits 12/16 fields,
  * producers/steam_utils.py:156-200).
  */
object SteamModel {

  /** `game_comments` topic payload (configmap:29-40). */
  val ReviewSchema: StructType = StructType(Seq(
    StructField("app_id", StringType),
    StructField("review_id", StringType),
    StructField("author_steamid", StringType),
    StructField("language", StringType),
    StructField("voted_up", BooleanType),
    StructField("votes_up", IntegerType),
    StructField("weighted_vote_score", FloatType),
    StructField("timestamp_created", IntegerType), // unix seconds
    StructField("review_text", StringType),
    StructField("scraped_at", StringType)))

  /** `game_info` topic payload (configmap:148-154). */
  val GameInfoSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("appid", IntegerType),
    StructField("type", StringType),
    StructField("genres", ArrayType(StringType)),
    StructField("timestamp_scraped", StringType))) // ISO-8601

  /** `game_player_count` topic payload (configmap:231-235). */
  val PlayerCountSchema: StructType = StructType(Seq(
    StructField("appid", IntegerType),
    StructField("player_count", IntegerType),
    StructField("timestamp", StringType))) // ISO-8601

  // ---- parsed (post-projection) row types; the Dataset[T] edges ----

  /** Flattened review row (configmap:58-65): voted_up→recommended,
    * timestamp_created cast to event-time.
    */
  final case class Review(
      app_id: String,
      review_id: String,
      author_steamid: String,
      language: String,
      recommended: Boolean,
      votes_up: Integer,
      weighted_vote_score: java.lang.Float,
      timestamp: java.sql.Timestamp,
      review_text: String)

  /** Flattened game row (configmap:169-176). */
  final case class GameInfo(
      name: String,
      appid: Integer,
      `type`: String,
      genres: Seq[String],
      timestamp: java.sql.Timestamp)

  /** Flattened player-count sample (configmap:250-255). */
  final case class PlayerSample(
      appid: Integer,
      player_count: Integer,
      timestamp: java.sql.Timestamp)

  // ---- hot (serving) table schemas (SURVEY.md §1.3) ----

  val SteamReviewsHot: StructType = StructType(Seq(
    StructField("window", StructType(Seq(
      StructField("start", TimestampType), StructField("end", TimestampType)))),
    StructField("recommended", BooleanType),
    StructField("total_reviews", LongType),
    StructField("avg_quality", DoubleType)))

  val ReviewBombAlerts: StructType = StructType(Seq(
    StructField("app_id", StringType),
    StructField("total_reviews", LongType),
    StructField("negative_count", LongType),
    StructField("positive_count", LongType),
    StructField("avg_quality", DoubleType),
    StructField("negative_ratio", DoubleType),
    StructField("positive_ratio", DoubleType),
    StructField("is_review_bomb", BooleanType)))

  val SteamChartsHot: StructType = StructType(Seq(
    StructField("genre", StringType),
    StructField("total_games", LongType)))

  val SteamPlayersHot: StructType = StructType(Seq(
    StructField("window", StructType(Seq(
      StructField("start", TimestampType), StructField("end", TimestampType)))),
    StructField("appid", IntegerType),
    StructField("max_players", IntegerType),
    StructField("avg_players", DoubleType)))
}
