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
    val spark = Engine.session()
    def run(dir: String, name: String): Boolean =
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        true
      } catch { case _: Throwable => false }
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(run(warmDir, _)) // warm-up: JIT, codegen, IO paths
    // min of two timed runs per query: GC pauses and OS scheduling noise
    // inflate single local[N] measurements by up to ~30%
    val results = names.map { name =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = run(sfDir, name)
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> (if (times.exists(_ >= 0)) times.filter(_ >= 0).min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
