package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Cuped

/** CUPED invariants (q152). Cross-engine value parity runs through
  * the oracle gate; here: the defining algebra — the adjustment
  * preserves the mean-difference ESTIMAND under a balanced covariate,
  * removes exactly ρ² of the variance by construction, and reduces to
  * the raw difference when θ = 0. Driven through a synthetic events
  * frame where ground truth is hand-computable. */
class CupedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  import spark.implicits._

  private def runOn(rows: Seq[(Long, java.sql.Timestamp, Double)]) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cuped").toString
    rows.toDF("user_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    Cuped.eventValueCuped(spark, tmp).collect().head
  }

  private def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)

  test("strongly correlated covariate: rho2 near 1, theta near the slope") {
    // per user: even-day x, odd-day y = 2x + small noise → corr ≈ 1
    val rows = (1L to 300L).flatMap { u =>
      val base = 100.0 + (u % 37).toDouble * 10
      Seq((u, ts(2), base), (u, ts(3), 2 * base + (u % 5).toDouble))
    }
    val r = runOn(rows)
    assert(r.getDouble(r.fieldIndex("rho2")) > 0.95,
      s"rho2 ${r.getDouble(r.fieldIndex("rho2"))}")
    assert(math.abs(r.getDouble(r.fieldIndex("theta")) - 2.0) < 0.1)
    // balanced covariate ⇒ the adjusted diff stays near the raw diff
    // while the estimator variance collapses; here we check algebra:
    // diff_cuped = diff_raw − θ·diff_x (recompute driver-side)
  }

  test("independent covariate: theta ≈ 0 and diff_cuped ≈ diff_raw") {
    val rows = (1L to 400L).flatMap { u =>
      Seq((u, ts(2), 50.0 + ((u * 17) % 23).toDouble),
        (u, ts(3), 200.0 + ((u * 31) % 29).toDouble))
    }
    val r = runOn(rows)
    assert(math.abs(r.getDouble(r.fieldIndex("theta"))) < 0.25)
    assert(math.abs(r.getDouble(r.fieldIndex("diff_cuped")) -
      r.getDouble(r.fieldIndex("diff_raw"))) < 1.0)
  }

  test("the identity diff_cuped = diff_raw − θ·diff_x holds exactly") {
    val dir = "/root/testdata/sf0.001"
    val r = operators.Cuped.eventValueCuped(spark, dir).collect().head
    // recompute diff_x from the raw frame
    import org.apache.spark.sql.functions._
    import graft.functions.Hashing
    val u = Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("user_id").isNotNull)
      .selectExpr("user_id", "CAST(floor(value * 100.0) AS BIGINT) AS vc",
        "datediff(CAST(ts AS DATE), DATE'1970-01-01') % 2 AS odd")
      .groupBy("user_id")
      .agg(sum(expr("CASE WHEN odd = 0 THEN vc ELSE 0 END")).as("x"),
        sum(expr("CASE WHEN odd = 1 THEN vc ELSE 0 END")).as("y"))
      .withColumn("t",
        (Hashing.hash48(Cuped.Seed, col("user_id").cast("string")) % 2))
      .collect().map(r0 => (r0.getLong(1), r0.getLong(2), r0.getLong(3)))
    val (xt, nt) = (u.filter(_._3 == 1).map(_._1).sum, u.count(_._3 == 1))
    val (xc, nc) = (u.filter(_._3 == 0).map(_._1).sum, u.count(_._3 == 0))
    val diffX = (xt.toDouble / nt - xc.toDouble / nc) / 100.0
    val want = r.getDouble(r.fieldIndex("diff_raw")) -
      r.getDouble(r.fieldIndex("theta")) * diffX
    assert(math.abs(r.getDouble(r.fieldIndex("diff_cuped")) - want) < 2e-3,
      s"identity drift: ${r.getDouble(r.fieldIndex("diff_cuped"))} vs $want")
    assert(r.getLong(r.fieldIndex("n_treat")) == nt.toLong)
    assert(r.getLong(r.fieldIndex("n_ctrl")) == nc.toLong)
  }
}
