package graft
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq("q1_pricing_summary","q2_analysis_join","q14_star_join",
      "q20_dedup_minhash","q22_ngram_jaccard","q23_embed_neardup","q24_ann_brute",
      "q12_validity_filter","q30_multimodal_meta","q18_sessionize")
    interesting.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
  }
}
