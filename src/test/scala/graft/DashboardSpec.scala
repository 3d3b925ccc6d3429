package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SteamOps
import graft.streaming.Sources

/** The reference's Grafana dashboard, panel by panel
  * (provisioning/dashboards/mongodb_dashboard.json:91-962): each of the 10
  * Mongo aggregation targets re-expressed 1:1 over hot tables built from
  * the reference's own CSV samples, with golden assertions computed
  * independently from the raw inputs.
  */
class DashboardSpec extends SparkSpec {
  import spark.implicits._

  private val base = "/root/reference/inputs"
  private def haveRef =
    new java.io.File(s"$base/charts/steamcharts_24h.csv").exists

  // hot tables as the streaming jobs would materialize them
  private lazy val reviews = Seq("730", "3948510", "3949040")
    .map(app => Sources.reviewsCsv(spark, s"$base/reviews/steam_reviews_$app.csv", app))
    .reduce(_.unionByName(_)).cache()
  private lazy val steamReviews = SteamOps.sentimentAgg(reviews).cache()
  private lazy val steamPlayers =
    SteamOps.playerWindowAgg(Sources.chartsCsv(spark, s"$base/charts/steamcharts_24h.csv"))
      .cache()
  private lazy val steamCharts = SteamOps.genreCount(
    Seq(
      ("A", Seq("Action", "Indie")), ("B", Seq("Action")),
      ("C", Seq("RPG", "Action")), ("D", Seq("Indie"))
    ).toDF("name", "genres")).cache()
  private lazy val reviewBombAlerts = SteamOps.reviewBombAgg(reviews).cache()

  private def round2(x: Double) =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("panel 1 (dashboard:91): Total Reviews — sum over sentiment windows") {
    assume(haveRef, "reference checkout not present")
    // $group _id:null, count: $sum $total_reviews → $project Total
    val total = steamReviews
      .agg(sum(col("total_reviews")).as("Total"))
      .collect().head.getLong(0)
    total shouldBe reviews.count() // golden: every parsed review counted once
  }

  test("panel 2 (dashboard:151): Peak Concurrent Players — max over windows") {
    assume(haveRef, "reference checkout not present")
    val peak = steamPlayers
      .agg(max(col("max_players")).as("Peak"))
      .collect().head.getInt(0)
    val rawMax = Sources.chartsCsv(spark, s"$base/charts/steamcharts_24h.csv")
      .agg(max("player_count")).collect().head.getInt(0)
    peak shouldBe rawMax
  }

  test("panel 3 (dashboard:219): Review Quality Score — avg of window avgs, 3 dp") {
    assume(haveRef, "reference checkout not present")
    // $group avg: $avg $avg_quality → $project Score: $round [avg, 3]
    val score = steamReviews
      .agg(round(avg(col("avg_quality")), 3).as("Score"))
      .collect().head.getDouble(0)
    val winAvgs = steamReviews.collect()
      .map(r => r.getAs[Any]("avg_quality")).collect { case d: Double => d }
    val expected = BigDecimal(winAvgs.sum / winAvgs.length)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    score shouldBe expected +- 1e-9
  }

  test("panel 4 (dashboard:279): Total Games — sum of per-genre counts") {
    val games = steamCharts
      .agg(sum(col("total_games")).as("Games"))
      .collect().head.getLong(0)
    games shouldBe 6L // Action×3 + Indie×2 + RPG×1 genre records
  }

  test("panel 5 (dashboard:354): Review Bomb Alerts — $match flag + $count") {
    assume(haveRef, "reference checkout not present")
    val alerts = reviewBombAlerts
      .filter(col("is_review_bomb") === true)
      .agg(count(lit(1)).as("Alerts"))
      .collect().head.getLong(0)
    // golden from raw rows: the flag rule is negRatio > 0.8 AND total > 10
    val expected = reviews.groupBy(col("app_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("recommended") === false, 1).otherwise(0)).as("neg"))
      .collect()
      .count(r => r.getLong(2).toDouble / r.getLong(1) > 0.8 && r.getLong(1) > 10)
    alerts shouldBe expected.toLong
  }

  test("panel 6 (dashboard:452): Overall Sentiment Distribution — $cond label + counts") {
    assume(haveRef, "reference checkout not present")
    val dist = steamReviews
      .groupBy(col("recommended"))
      .agg(sum(col("total_reviews")).as("total"))
      .select(
        when(col("recommended"), lit("Positive")).otherwise(lit("Negative"))
          .as("Sentiment"),
        col("total").as("Count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pos = reviews.filter(col("recommended") === true).count()
    val neg = reviews.filter(col("recommended") === false).count()
    dist.getOrElse("Positive", 0L) shouldBe pos
    dist.getOrElse("Negative", 0L) shouldBe neg
  }

  test("panel 7 (dashboard:578): Concurrent Players Over Time — project + sort") {
    assume(haveRef, "reference checkout not present")
    val series = steamPlayers
      .select(
        col("window.start").as("time"),
        col("max_players").as("Players"),
        col("appid").cast("string").as("AppID"))
      .orderBy(col("time"))
      .collect()
    series.length shouldBe steamPlayers.count()
    val times = series.map(_.getTimestamp(0).getTime)
    times.sorted shouldBe times // ascending, as the $sort demands
    all(series.map(_.getString(2))) should fullyMatch regex """\d+"""
  }

  test("panel 8 (dashboard:732): Game Review Sentiment — top-10 by negative ratio") {
    assume(haveRef, "reference checkout not present")
    val tbl = reviewBombAlerts
      .orderBy(col("negative_ratio").desc)
      .limit(10)
      .select(
        col("app_id"),
        round(col("positive_ratio"), 2).as("positive_ratio"),
        round(col("negative_ratio"), 2).as("negative_ratio"))
      .collect()
    tbl.length should be <= 10
    // golden per app from the raw rows
    val raw = reviews.groupBy(col("app_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("recommended") === false, 1).otherwise(0)).as("neg"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(2).toDouble / r.getLong(1))).toMap
    tbl.foreach { r =>
      r.getDouble(2) shouldBe round2(raw(r.getString(0))) +- 1e-9
      r.getDouble(1) shouldBe round2(1.0 - raw(r.getString(0))) +- 1e-9
    }
    // descending order by negative ratio
    val negs = tbl.map(_.getDouble(2))
    negs.sorted.reverse shouldBe negs
  }

  test("panel 9 (dashboard:821): Game Distribution by Genre — top-18 bar chart") {
    val bars = steamCharts
      .orderBy(col("total_games").desc, col("genre"))
      .limit(18)
      .select(col("genre").as("Genre"), col("total_games").as("Games"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    bars shouldBe Array(("Action", 3L), ("Indie", 2L), ("RPG", 1L))
  }

  test("panel 10 (dashboard:962): Top Games by Peak Players — re-agg + rank row") {
    assume(haveRef, "reference checkout not present")
    val top = steamPlayers
      .groupBy(col("appid"))
      .agg(max(col("max_players")).as("peak"), avg(col("avg_players")).as("avgp"))
      .orderBy(col("peak").desc)
      .limit(10)
      .select(
        lit("#").as("Rank"),
        col("appid").as("App ID"),
        col("peak").as("Peak Players"),
        round(col("avgp"), 0).as("Avg Players"))
      .collect()
    top.length should be <= 10
    val peaks = top.map(_.getAs[Int]("Peak Players"))
    peaks.sorted.reverse shouldBe peaks
    // golden: the global top-1 peak equals the raw CSV maximum
    val rawMax = Sources.chartsCsv(spark, s"$base/charts/steamcharts_24h.csv")
      .agg(max("player_count")).collect().head.getInt(0)
    peaks.head shouldBe rawMax
    all(top.map(_.getString(0))) shouldBe "#"
  }
}
