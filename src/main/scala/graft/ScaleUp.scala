package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the bench scaling study:
  * `runMain graft.ScaleUp <srcSfDir> <outDir> [factor]` replicates every
  * table `factor`× with disjoint key spaces, so per-query scaling ratios
  * (PERF.md) can be measured beyond the driver-provided scale factors.
  *
  * Replication is NOT naive row copying — that would plant `factor` exact
  * duplicates of every document/embedding and blow the near-dup queries
  * up quadratically in a way real growth does not:
  *  - fact tables (orders/lineitem/customer/supplier/part, events,
  *    documents, embeddings): primary and foreign keys shift by
  *    `k * (max+1)` per replica, keeping joins 1:1 within each replica;
  *  - dimension tables (region, nation) stay fixed, and dimension FKs
  *    (c_nationkey …) are NOT shifted — groups grow `factor`×, the
  *    dimension does not (the realistic shape);
  *  - events keep user_id and ts unshifted: users accumulate more
  *    events, windows hold more rows — growth in density, not key space;
  *  - documents get one replica-unique token appended so replicas are
  *    not exact duplicates;
  *  - embeddings are cyclically rotated by `k` dimensions per replica —
  *    norm-preserving, distribution-preserving, decorrelated from the
  *    original (a rotated hash-random vector is just another
  *    hash-random vector).
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local("graft-scaleup")
    try scaleAll(spark, src, out, factor)
    finally spark.stop()
  }

  def scaleAll(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")

    // fixed dimensions: copy once
    Seq("region", "nation").foreach(n => write(read(n), n))

    // key spans come from the table that OWNS the key, so foreign keys
    // shift by the same amount as the primary keys they reference and
    // every replica's joins stay 1:1
    def spanOf(name: String, key: String): Long =
      read(name).agg(max(col(key))).collect()(0).getLong(0) + 1L
    val span = Map(
      "custkey"  -> spanOf("customer", "c_custkey"),
      "suppkey"  -> spanOf("supplier", "s_suppkey"),
      "partkey"  -> spanOf("part", "p_partkey"),
      "orderkey" -> spanOf("orders", "o_orderkey"),
      "event_id" -> spanOf("events", "event_id"),
      "doc_id"   -> spanOf("documents", "doc_id"),
      "vec_id"   -> spanOf("embeddings", "vec_id"))

    def replicate(name: String, keyCols: Map[String, String],
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = read(name)
      val parts = (0 until factor).map { k =>
        val s = keyCols.foldLeft(base) { case (d, (c, dom)) =>
          d.withColumn(c, col(c) + lit(k.toLong * span(dom)))
        }
        extra(s, k)
      }
      write(parts.reduce(_.unionByName(_)), name)
    }

    replicate("customer", Map("c_custkey" -> "custkey"))
    replicate("supplier", Map("s_suppkey" -> "suppkey"))
    replicate("part", Map("p_partkey" -> "partkey"))
    replicate("orders", Map("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"))
    replicate("lineitem", Map(
      "l_orderkey" -> "orderkey", "l_partkey" -> "partkey", "l_suppkey" -> "suppkey"))
    replicate("events", Map("event_id" -> "event_id"))
    // prepend a replica-unique 32-char hash: replicas of the same source
    // doc differ from the original AND from each other right in the
    // prefix, so they register as distinct documents to prefix-window
    // verifiers (a trailing-only marker would plant factor²/2 artificial
    // "near-dup" pairs per source doc)
    replicate("documents", Map("doc_id" -> "doc_id"), (d, k) =>
      if (k == 0) d
      else d.withColumn("text",
        concat(md5(concat(lit(k.toString), lit(":"), col("doc_id").cast("string"))),
          lit(" "), col("text"))))
    // rotation alone is NOT enough: rotations compound additively when
    // ScaleUp is applied repeatedly (sf0.1 →×10 sf1 →×10 sf10 →×10
    // sf100), so replica paths (p, q, r) with equal p+q+r produced
    // IDENTICAL vectors — ~150-way exact-dup cliques at sf100 that blew
    // the SRP-band join's bucket quadratic (2.6e9 pair instances, found
    // by the r9 sf100 study). A per-replica md5 sign-flip mask composes
    // multiplicatively across applications (collision odds ~2⁻ᵈⁱᵐˢ per
    // path pair), stays norm-preserving, and keeps the component
    // distribution (symmetric around 0) intact.
    replicate("embeddings", Map("vec_id" -> "vec_id"), (d, k) =>
      if (k == 0) d
      else d.withColumn("embedding", expr(
        s"""transform(embedding, (x, i) ->
           |  embedding[(i + $k) % size(embedding)] *
           |  (1 - 2 * (CAST(conv(substr(md5(concat('$k', ':', i)), 1, 1), 16, 10)
           |            AS INT) % 2)))""".stripMargin)))
  }
}
