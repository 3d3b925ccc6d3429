package graft.functions

import org.apache.hadoop.fs.{FileContext, FileSystem, Path}

import org.apache.spark.sql.SparkSession

/** Atomic directory publication for persisted store layouts (posting
  * stores, CDC chunk stores, per-batch decision/report directories,
  * streamed ANN index partitions).
  *
  * The failure mode these two entry points remove: a per-batch store
  * partition written with `mode("overwrite")` is delete-then-write, so a
  * reader (an offline decontamination probe, a serving query) racing the
  * write can observe the directory HALF-WRITTEN — for a decontamination
  * tool that is a silent false "not contaminated". Here every directory
  * is produced in a hidden temp sibling (`_tmp_<name>` — the leading
  * underscore keeps it invisible to Spark's file listing and partition
  * discovery) and published with one filesystem `rename`, an atomic
  * metadata operation on HDFS and local filesystems (object stores
  * without atomic rename need their usual commit-service arrangement,
  * exactly as for [[graft.streaming.ParquetUpsertSink]]'s pointer swap).
  * A reader therefore sees a published directory either absent or
  * complete — never partial.
  *
  * Single-writer-per-store is assumed (the streaming-query model: one
  * driver owns a store's ingest), as for every sink in
  * [[graft.streaming.Sinks]].
  */
object Stores {

  /** Nonce scratch dirs created by [[scratchDir]], recursively deleted
    * by one JVM shutdown hook. Catalog queries that build a throwaway
    * store (BM25 snapshot/stream/compaction, posting compaction) need a
    * per-invocation-unique path — concurrent evaluations must not race a
    * shared path's rewrite — but an un-swept nonce dir per evaluation
    * accumulates unboundedly in /tmp across Bench/Verify rounds.
    */
  private val scratchRegistry =
    java.util.Collections.synchronizedSet(new java.util.LinkedHashSet[String]())
  private def rmTree(f: java.io.File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(rmTree)
    f.delete(); ()
  }
  private lazy val scratchHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      scratchRegistry.forEach { p =>
        rmTree(new java.io.File(p))
        sentinelFor(p).delete()
      }
    }, "graft-scratch-sweep"))
  }

  /** Sentinel files recording every registered scratch path, one tiny
    * file per nonce under `<tmpdir>/.graft_scratch/` (name = a hash of
    * the path, content = the path). The shutdown hook removes the
    * sentinel with the dir on clean exit; a KILLED JVM (OOM, SIGKILL —
    * exactly the runs most likely to strand large nonce stores) leaves
    * both behind for [[sweepStaleScratch]] to reap at the next start.
    * Sweeping only sentinel-recorded paths — never a name-pattern scan
    * of /tmp — is what makes the sweep safe: sibling `graft_sf*` scaled
    * DATA directories share the name prefix and must never be touched.
    */
  private def sentinelDir: java.io.File =
    new java.io.File(System.getProperty("java.io.tmpdir"), ".graft_scratch")
  private def sentinelFor(path: String): java.io.File =
    new java.io.File(sentinelDir,
      java.util.UUID.nameUUIDFromBytes(path.getBytes("UTF-8")).toString)

  /** Best-effort reap of scratch dirs stranded by crashed/killed JVMs:
    * delete every sentinel-recorded path whose sentinel is older than
    * `maxAgeHours` and that this JVM does not own. Called at Bench /
    * Verify / Smoke startup. The age gate (default 6 h, ≥ any single
    * run's lifetime here) keeps a CONCURRENT healthy run's live scratch
    * out of reach; errors are swallowed — a failed sweep must never
    * fail the run it piggybacks on.
    */
  def sweepStaleScratch(maxAgeHours: Double = 6.0): Int = {
    val cutoff = System.currentTimeMillis() - (maxAgeHours * 3600e3).toLong
    var n = 0
    try {
      val ms = Option(sentinelDir.listFiles()).getOrElse(Array.empty)
      ms.foreach { m =>
        if (m.isFile && m.lastModified() < cutoff) {
          val target = new String(
            java.nio.file.Files.readAllBytes(m.toPath), "UTF-8").trim
          if (target.nonEmpty && !scratchRegistry.contains(target)) {
            rmTree(new java.io.File(target))
            m.delete()
            n += 1
          }
        }
      }
    } catch { case _: Exception => () }
    n
  }

  /** A fresh per-invocation-unique local scratch directory path
    * `<tmpdir>/<prefix><uuid8>_<basename>`, registered for recursive
    * deletion at JVM exit. The dir itself is NOT created — the caller's
    * store writer publishes into it — so the nonce never pre-exists and
    * `publishOnce`'s replay no-op path cannot silently serve stale
    * state.
    */
  def scratchDir(prefix: String, basename: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/$prefix" +
      s"${java.util.UUID.randomUUID().toString.take(8)}_$basename"
    registerScratch(p)
    p
  }

  /** Register an externally-created local path (a spec fixture dir) for
    * the same at-exit recursive sweep [[scratchDir]] nonces get.
    */
  def registerScratch(path: String): Unit = {
    scratchHook
    scratchRegistry.add(path)
    try {
      sentinelDir.mkdirs()
      java.nio.file.Files.write(
        sentinelFor(path).toPath, path.getBytes("UTF-8"))
      ()
    } catch { case _: Exception => () } // sentinel is best-effort
    ()
  }

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    FileSystem.get(new java.net.URI(dir), spark.sessionState.newHadoopConf())

  private def tmpSibling(finalDir: String): Path = {
    val p = new Path(finalDir)
    // no '=' in the temp name: Spark's hidden-path filter EXEMPTS
    // underscore-prefixed names containing '=' (they could be partition
    // directories of a column whose name starts with '_'), so
    // `_tmp_batch=1` would be listed and break partition inference —
    // `_tmp_batch_1` is genuinely invisible
    new Path(p.getParent, s"_tmp_${p.getName.replace('=', '_')}")
  }

  private def rename(spark: SparkSession, fs: FileSystem, src: Path, dst: Path): Unit =
    // no OVERWRITE option: the destination must not exist, so a publish
    // can never clobber a committed directory
    FileContext.getFileContext(fs.getUri, spark.sessionState.newHadoopConf())
      .rename(fs.makeQualified(src), fs.makeQualified(dst))

  /** Publish `finalDir` exactly once: run `write` against the hidden
    * temp sibling, then rename it into place. If `finalDir` already
    * exists the write is SKIPPED entirely and `false` is returned —
    * the per-batch store contract: a batch directory only ever appears
    * via the atomic rename, so an existing one is complete, and a
    * replayed micro-batch (same batch id re-delivered after a crash
    * between sink commit and checkpoint commit) is a no-op instead of a
    * delete-then-rewrite that readers could observe half-written. A
    * crashed attempt leaves only the temp sibling, which the retry
    * overwrites.
    */
  def publishOnce(spark: SparkSession, finalDir: String)(write: String => Unit): Boolean = {
    val fs  = fsOf(spark, finalDir)
    val dst = new Path(finalDir)
    val tmp = tmpSibling(finalDir)
    if (fs.exists(dst)) {
      fs.delete(tmp, true) // a stale crashed-attempt temp, if any
      false
    } else {
      write(tmp.toString)
      rename(spark, fs, tmp, dst)
      true
    }
  }

  /** Publish `finalDir` with replacement — for one-shot stores that
    * support REBUILD (a posting index rebuilt on a new corpus
    * snapshot). The new contents are fully written to the temp sibling
    * first; if an old version exists it is renamed aside and deleted
    * only after the new one is in place, so a concurrent reader sees
    * the old store or the new store, never a partial one. (The swap is
    * two metadata renames; a reader listing in exactly that window sees
    * the directory briefly ABSENT — complete-or-absent, never partial.
    * Serving layouts that must never even be absent use the
    * [[graft.streaming.ParquetUpsertSink]] snapshot + pointer idiom
    * instead.)
    */
  def publishReplace(spark: SparkSession, finalDir: String)(write: String => Unit): Unit = {
    val fs  = fsOf(spark, finalDir)
    val dst = new Path(finalDir)
    val tmp = tmpSibling(finalDir)
    write(tmp.toString)
    if (fs.exists(dst)) {
      val old = new Path(tmp.getParent, s"${tmp.getName}.old")
      fs.delete(old, true)
      rename(spark, fs, dst, old)
      rename(spark, fs, tmp, dst)
      fs.delete(old, true)
    } else rename(spark, fs, tmp, dst)
  }

  /** Count committed data files under `dir` whose path contains
    * `marker` (default: inside a `batch=` layer). A file counts only if
    * NO directory component strictly below `dir` is hidden (`_`/`.`
    * prefix) — a crashed publish attempt leaves a hidden temp sibling
    * (`_tmp_*`, `_tmp_*.old`) whose contents are workspace, not store,
    * and a marker-substring test alone would count them (the
    * [[publishReplace]] temp holds a real `batch=<id>` subtree).
    * Used by the store compactors' before/after file accounting.
    */
  def committedDataFiles(
      spark: SparkSession, dir: String, marker: String = "/batch="): Long = {
    val fs = fsOf(spark, dir)
    val root = fs.makeQualified(new Path(dir))
    if (!fs.exists(root)) return 0L
    val rootStr = root.toString
    val it = fs.listFiles(root, true)
    var n = 0L
    while (it.hasNext) {
      val p = fs.makeQualified(it.next().getPath).toString
      if (p.startsWith(rootStr + "/")) {
        val rel = p.substring(rootStr.length + 1).split('/')
        val visible = rel.forall(c => !c.startsWith("_") && !c.startsWith("."))
        if (visible && p.contains(marker)) n += 1
      }
    }
    n
  }
}
