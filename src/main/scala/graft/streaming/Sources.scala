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
}
