package graft

/** Plan-audit utility: dump the formatted physical plan of each named
  * query (all queries when no args) at sf0.01. Used to check the
  * invariants in SURVEY.md §6 — filters pushed to the parquet scan,
  * ReadSchema pruned, dims broadcast, no stray CartesianProduct, and
  * wide WholeStageCodegen spans.
  *
  *   sbt "runMain graft.ExplainMain q14_star_join q22_ngram_jaccard"
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
  }
}
