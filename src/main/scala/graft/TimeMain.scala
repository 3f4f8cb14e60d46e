package graft

/** Targeted timing utility: Bench's exact methodology (noop sink,
  * sf0.001 warm-up pass, min-of-2) for a NAMED subset of queries, so a
  * single operator's perf iteration doesn't cost a full-suite pass.
  *
  *   sbt "runMain graft.TimeMain /root/testdata/sf0.1 q164_quantile_reg"
  */
object TimeMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = Engine.session()
    def run(d: String, name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // Bench's isolation rule (r14): free pinned checkpoint blocks
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      dt
    }
    names.foreach(run("/root/testdata/sf0.001", _)) // JIT/codegen warm-up
    names.foreach { n =>
      val best = (1 to 2).map(_ => run(dir, n)).min
      println(f"TIME $n%-24s $best%.2fs")
    }
    spark.stop()
  }
}
