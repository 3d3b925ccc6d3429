package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, sum}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Streaming sinks (SURVEY.md §2.A).
  *
  * A2 — parquet archive (cold path): Spark's built-in file sink, append
  * mode, exactly-once via the sink manifest + checkpoint.
  *
  * A3 — the reference rewrites ENTIRE aggregates into MongoDB every
  * trigger (`outputMode("complete")`, configmap:104-111) — O(result) work
  * per trigger and unbounded state, which does not survive 100 TB. The
  * idiomatic replacement is `update` output mode + `foreachBatch` upsert
  * keyed on the group columns: each trigger touches only changed keys.
  * [[ParquetUpsertSink]] implements the upsert against a snapshot-versioned
  * parquet table (the same merge a Delta/Iceberg MERGE would do, on plain
  * parquet with an atomic pointer swap — no extra dependencies).
  */
object Sinks {

  /** A2 — cold-path parquet archive (configmap:95-101, 188-194, 268-274).
    *
    * `partitionCols` (the reference archives unpartitioned — a scale bug)
    * keys the directory layout, typically by event date: readers with a
    * date predicate then scan only matching partitions (PartitionFilters),
    * and the D9 retention job becomes a partition drop instead of a
    * rewrite.
    */
  def parquetArchive(
      df: DataFrame,
      path: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 minute"),
      partitionCols: Seq[String] = Nil): DataStreamWriter[Row] = {
    val w = df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .outputMode("append")
    if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
  }

  /** A3 (parity flavor) — complete-mode in-memory table, reproducing the
    * reference's rewrite-the-world semantics exactly for tests
    * (configmap:104-111; SURVEY.md §7.4 risk 1).
    */
  def completeToMemory(
      df: DataFrame,
      queryName: String,
      trigger: Trigger = Trigger.ProcessingTime(0)): DataStreamWriter[Row] =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(trigger)

  /** A3 (scale flavor) — update-mode upsert via foreachBatch. */
  def upsert(
      df: DataFrame,
      sink: ParquetUpsertSink,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0)): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, batchId: Long) => sink.upsert(batch, batchId))
}

/** Keyed upsert into a snapshot-versioned parquet table.
  *
  * Layout: `root/v<n>/` snapshot directories plus a `root/_CURRENT` pointer
  * file naming the live snapshot. Each upsert writes a full new snapshot =
  * (old rows whose key is absent from the batch) ∪ (batch rows), then
  * atomically swaps the pointer. Readers go through [[read]].
  *
  * At scale: rows-per-key aggregates are small relative to data scanned,
  * and the anti-join is a broadcast of the batch's key set; partition the
  * snapshot by a key prefix to turn the rewrite into partition overwrite.
  * Idempotent per batchId: re-running a batch converges to the same table.
  */
final class ParquetUpsertSink(val root: String, val keys: Seq[String]) extends Serializable {

  private def pointer: Path = Paths.get(root, "_CURRENT")

  private def currentVersion: Option[Long] =
    if (Files.exists(pointer)) Some(Files.readString(pointer).trim.toLong) else None

  def read(spark: SparkSession): Option[DataFrame] =
    currentVersion.map(v => spark.read.parquet(s"$root/v$v"))

  def upsert(batch: DataFrame, batchId: Long): Unit = synchronized {
    val merged = read(batch.sparkSession) match {
      case Some(existing) =>
        existing.join(batch.select(keys.map(col): _*), keys, "left_anti")
          .unionByName(batch)
      case None => batch
    }
    writeSnapshot(merged, batchId)
  }

  /** Incremental aggregate maintenance: merge a PER-BATCH partial
    * aggregate additively into the stored table — `sumCols` are summed
    * with the existing row per key, other non-key columns must be derived
    * from sums on read (store sum+count, not avg). Each trigger costs
    * O(|batch| + |touched keys|); the archive is never re-read, unlike a
    * from-scratch re-aggregation. The caller aggregates the RAW batch
    * (per-batch deltas) — feeding cumulative update-mode output here
    * would double-count.
    */
  def upsertAdditive(
      batch: DataFrame, batchId: Long, sumCols: Seq[String]): Unit = synchronized {
    val merged = read(batch.sparkSession) match {
      case Some(existing) =>
        existing.unionByName(batch)
          .groupBy(keys.map(col): _*)
          .agg(sum(sumCols.head).as(sumCols.head),
            sumCols.tail.map(c => sum(c).as(c)): _*)
      case None => batch
    }
    writeSnapshot(merged, batchId)
  }

  private def writeSnapshot(df: DataFrame, batchId: Long): Unit = {
    val next = currentVersion.getOrElse(-1L) + 1
    Files.createDirectories(Paths.get(root))
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/v$next")
    val tmp = Paths.get(root, s"_CURRENT.tmp$batchId")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
