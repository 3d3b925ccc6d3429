package graft

/** Single-query runner for scale diagnosis: execute ONE catalog query
  * against a dataset and print its row count (exceptions surface
  * instead of being swallowed into Bench's -1).
  *
  *   sbt "runMain graft.RunOne <sfDir> <queryName>"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: RunOne <sfDir> <queryName>")
    val sfDir = args(0)
    val name  = args(1)
    val spark = GraftSession.local("graft-runone")
    val q = Queries.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query: $name"))
    try println(s"ROWS ${q.spark(spark, sfDir).count()}")
    finally spark.stop()
  }
}
