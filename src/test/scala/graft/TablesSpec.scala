package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}

/** Tables.events normalization: every physical shape the testdata
  * generator can emit for `ts` (nanos-as-long, TIMESTAMP_NTZ, plain
  * TIMESTAMP) must surface as TimestampType holding the same UTC
  * INSTANTS regardless of spark.sql.session.timeZone — the oracle
  * compares rendered instants, so a session-timezone-dependent shift
  * would silently corrupt every event-time query.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  /** Run `body` with the session timezone temporarily overridden —
    * the point of these tests is that the result does NOT depend on it.
    */
  private def withSessionTz[A](tz: String)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try body
    finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("TIMESTAMP_NTZ ts round-trips to the same UTC instant under any session timezone") {
    // wall clock 2024-01-02 03:04:05.123456, semantically UTC
    val expected = java.time.Instant.parse("2024-01-02T03:04:05.123456Z")
    val micros = expected.getEpochSecond * 1000000L + expected.getNano / 1000L
    val dir = tmpDir("events-ntz")
    spark.sql(
      """SELECT 1L AS event_id, 7L AS user_id, 'purchase' AS event_type,
        |  1.5D AS value, TIMESTAMP_NTZ'2024-01-02 03:04:05.123456' AS ts
        |""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq("UTC", "America/New_York", "Asia/Tokyo").foreach { tz =>
      withSessionTz(tz) {
        val ev = Tables(spark, dir).events
        withClue(s"session tz $tz: ") {
          ev.schema("ts").dataType shouldBe TimestampType
          ev.select(unix_micros(col("ts"))).as[Long].collect() shouldBe Array(micros)
        }
      }
    }
    // sanity: the parquet really did round-trip as NTZ (the branch under test)
    spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType shouldBe TimestampNTZType
  }

  test("nanos-as-long ts divides exactly: sub-microsecond ns values truncate, never round up") {
    // 1704164645123456999 ns = ...123456 µs + 999 ns; double division
    // (ns/1000.0 then truncate) can land on ...123457 — the exact
    // integer div must give ...123456 under any session timezone
    val ns = 1704164645123456999L
    val dir = tmpDir("events-ns")
    Seq((1L, ns)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq("UTC", "America/New_York").foreach { tz =>
      withSessionTz(tz) {
        val ev = Tables(spark, dir).events
        withClue(s"session tz $tz: ") {
          ev.schema("ts").dataType shouldBe TimestampType
          ev.select(unix_micros(col("ts"))).as[Long].collect() shouldBe
            Array(1704164645123456L)
        }
      }
    }
  }

  test("nanos-as-long ts floors pre-epoch values: negative non-µs-aligned ns land one µs EARLIER") {
    // -1500 ns is between -2 µs and -1 µs; floor semantics (timestamp
    // truncation toward negative infinity) requires -2 µs — truncation
    // toward zero (a bare integer div) would land at -1 µs (ADVICE r8).
    // µs-aligned and positive values are unaffected.
    val dir = tmpDir("events-ns-neg")
    Seq((1L, -1500L), (2L, -2000L), (3L, 1500L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables(spark, dir).events
      .orderBy("event_id")
      .select(unix_micros(col("ts"))).as[Long].collect()
    got shouldBe Array(-2L, -2L, 1L)
  }
}
