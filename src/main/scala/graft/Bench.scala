package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR.
  *
  * Methodology: each query is forced through a `noop` sink write (full
  * plan materialization — a bare count() would let Catalyst skip the
  * projected columns of map-only queries), after one warm-up pass of the
  * whole suite at sf0.001 so JVM/codegen/datasource initialization isn't
  * billed to whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(dir: String, name: String): Boolean =
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        true
      } catch { case _: Throwable => false }
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(run(warmDir, _)) // warm-up: JIT, codegen, IO paths
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val ok = run(sfDir, name)
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
