package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftBridge.localCheckpointHandle

/** Specs for the lineage-cut bridge (`localCheckpointHandle`). */
class BridgeSpec extends SparkSpec {

  test("declared hash partitioning: same results as the vanilla checkpoint, no exchange") {
    // skewed keys so a wrong partition assignment (declared layout ≠
    // physical layout) would split a group across partitions and break
    // the exchange-free aggregate below
    val df = spark.range(20000)
      .select((col("id") % lit(7) * col("id") % lit(97)).as("k"),
        col("id").as("v"))
      .repartition(16, col("k"))
    val (plain, plainRdd) = localCheckpointHandle(df)
    val (keyed, keyedRdd) = localCheckpointHandle(df, Seq("k"))
    // the declared plan must expose hash(k): a groupBy over it plans
    // WITHOUT an exchange
    val agg = keyed.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange hashpartitioning"),
      s"declared partitioning not honored:\n$aggPlan")
    // and the exchange-free aggregate must equal the vanilla (shuffled)
    // aggregate bit-for-bit
    val exp = plain.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = agg.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe exp
    plainRdd.unpersist(blocking = false)
    keyedRdd.unpersist(blocking = false)
  }

  test("declared key missing from output fails fast") {
    val df = spark.range(10).select(col("id").as("k")).repartition(4, col("k"))
    val e = intercept[RuntimeException](localCheckpointHandle(df, Seq("nope")))
    e.getMessage should include("declared hash key")
  }
}
