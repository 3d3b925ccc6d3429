package graft

import org.apache.spark.sql.functions._

import graft.operators.{Serving, SteamOps}
import graft.streaming.Sources

/** The reference's five presentation queries (test/demo-queries.js:22-245)
  * re-expressed as batch DataFrame queries over hot tables built from the
  * reference's own offline CSV samples — the acceptance surface a
  * reference user would actually run after switching engines.
  */
class DemoQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val base = "/root/reference/inputs"
  private def haveRef =
    new java.io.File(s"$base/charts/steamcharts_24h.csv").exists

  // hot tables, built once via the engine's own aggregations
  private lazy val reviews =
    Sources.reviewsCsv(spark, s"$base/reviews/steam_reviews_730.csv", "730")
  private lazy val steamReviews = SteamOps.sentimentAgg(reviews).cache()
  private lazy val steamPlayers =
    SteamOps.playerWindowAgg(Sources.chartsCsv(spark, s"$base/charts/steamcharts_24h.csv"))
      .cache()
  private lazy val steamCharts = SteamOps.genreCount(
    Seq(
      ("A", Seq("Action", "Indie")), ("B", Seq("Action")),
      ("C", Seq("RPG", "Action")), ("D", Seq("Indie"))
    ).toDF("name", "genres")).cache()

  test("demo 1: latest 10 review windows with labels and formatted ranges") {
    assume(haveRef, "reference checkout not present")
    val q1 = steamReviews
      .select(
        concat(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm"), lit(" → "),
          date_format(col("window.end"), "HH:mm")).as("time_window"),
        Serving.sentimentLabel(col("recommended")).as("sentiment"),
        col("total_reviews"),
        round(col("avg_quality"), 3).as("avg_quality"),
        col("window.start").as("ws"))
      .orderBy(col("ws").desc)
      .limit(10)
    val rows = q1.collect()
    rows.length should be <= 10
    rows.length should be > 0
    all(rows.map(_.getString(1))) should (be("Positive") or be("Negative"))
    // formatted range matches "yyyy-MM-dd HH:mm → HH:mm"
    all(rows.map(_.getString(0))) should fullyMatch regex
      """\d{4}-\d{2}-\d{2} \d{2}:\d{2} → \d{2}:\d{2}"""
    // sorted newest first
    val starts = rows.map(_.getTimestamp(4).getTime)
    starts.sorted.reverse shouldBe starts
  }

  test("demo 2: top genres by game count (sort + limit over hot table)") {
    val top = Serving.topK(steamCharts, 10, col("total_games").desc, col("genre"))
      .collect()
    top.map(r => (r.getString(0), r.getLong(1))).take(2) shouldBe
      Array(("Action", 3L), ("Indie", 2L))
  }

  test("demo 3: top-10 games by peak players (re-aggregation of windows)") {
    assume(haveRef, "reference checkout not present")
    val q3 = Serving.reAggregate(
      steamPlayers, Seq("appid"),
      Seq(
        count(lit(1)).as("total_windows"),
        avg(col("avg_players")).as("overall_avg_players"),
        max(col("max_players")).as("peak_players"),
        max(col("window.end")).as("latest_window")))
    val top = Serving.topK(q3, 10, col("peak_players").desc, col("appid"))
      .collect()
    top.length should be <= 10
    // descending by peak
    val peaks = top.map(_.getAs[Int]("peak_players"))
    peaks.sorted.reverse shouldBe peaks
    // peak of peaks equals the raw CSV maximum
    val rawMax = Sources.chartsCsv(spark, s"$base/charts/steamcharts_24h.csv")
      .agg(max("player_count")).collect().head.getInt(0)
    peaks.head shouldBe rawMax
  }

  test("demo 4: sentiment distribution re-aggregation is lossless") {
    assume(haveRef, "reference checkout not present")
    val q4 = steamReviews
      .groupBy(col("recommended"))
      .agg(
        count(lit(1)).as("total_windows"),
        sum(col("total_reviews")).as("total_reviews"),
        avg(col("avg_quality")).as("avg_quality"))
      .orderBy(col("recommended").desc)
      .collect()
    q4.map(_.getBoolean(0)).toSet shouldBe Set(true, false)
    // re-aggregated totals equal the source row count — nothing lost
    q4.map(_.getLong(2)).sum shouldBe reviews.count()
  }

  test("demo 5: cross-collection dashboard summary (D6-D8)") {
    assume(haveRef, "reference checkout not present")
    val summary = Serving.unionSummary(Seq(
      "review_windows" -> steamReviews,
      "genre_records"  -> steamCharts,
      "player_windows" -> steamPlayers)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    summary("review_windows") shouldBe steamReviews.count()
    summary("genre_records") shouldBe 3L
    summary("player_windows") shouldBe steamPlayers.count()

    // key metrics + latest-activity argmax rows (findOne with sort)
    val totalReviews = steamReviews.agg(sum("total_reviews")).collect().head.getLong(0)
    totalReviews shouldBe reviews.count()
    val latestPlayer = Serving.latest(steamPlayers, col("window.end").desc)
      .select(col("window.end")).collect()
    latestPlayer should have length 1
    latestPlayer.head.getTimestamp(0) shouldBe
      steamPlayers.agg(max(col("window.end"))).collect().head.getTimestamp(0)
  }
}
