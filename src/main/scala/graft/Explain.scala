package graft

/** Plan-audit diagnostic: dump `explain("formatted")` for every catalog
  * query so scan pruning (`ReadSchema`, `PushedFilters`), join strategies
  * (`BroadcastHashJoin` vs `SortMergeJoin`) and `WholeStageCodegen` spans
  * can be reviewed. Usage:
  *
  *   sbt "runMain graft.Explain <sfDir> [queryName]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only  = args.lift(1)
    val spark = GraftSession.local("graft-explain")
    try {
      Queries.all
        .filter(q => only.forall(_ == q.name))
        .foreach { q =>
          println(s"\n######## ${q.name} — ${q.operators}")
          q.spark(spark, sfDir).explain("formatted")
        }
    } finally spark.stop()
  }
}
