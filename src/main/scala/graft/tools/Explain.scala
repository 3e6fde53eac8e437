package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection for any registered query:
  * `runMain graft.tools.Explain <sfDir> <query> [query…]` prints each
  * query's `explain("formatted")` — the feedback loop the build brief
  * prescribes (scan pruning, PushedFilters, WholeStageCodegen spans,
  * Exchange counts) without writing a scratch main each time.
  * With no query names, prints all of them.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <sfDir> [query…]")
    val sfDir = args.head
    val spark = SparkSession.builder()
      .appName("graft-explain")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val names =
        if (args.length > 1) args.tail.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
      names.foreach { name =>
        val fn = graft.SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query: $name (have: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})"))
        println(s"\n=================== $name ===================")
        fn(spark, sfDir).explain("formatted")
      }
    } finally spark.stop()
  }
}
