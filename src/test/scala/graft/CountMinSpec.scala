package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.CountMin

/** Count–min sketch (q246): the one-sided overestimate guarantee,
  * no-collision exactness, the forced-collision degenerate, depth
  * monotonicity, the additive merge identity, and the registered
  * top-20 audit. Value-level oracle equivalence runs through
  * graft.Verify. */
class CountMinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def cellsOf(m: Map[String, Long]) = {
    import spark.implicits._
    m.toSeq.toDF("t", "c")
  }

  private def estMap(cells: Map[String, Long], d: Int = CountMin.D,
                     w: Int = CountMin.W): Map[String, Long] = {
    val df = cellsOf(cells)
    CountMin.estimates(df.select("t"), CountMin.table(df, d, w), d, w)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("est >= true always; exact when the vocabulary is tiny") {
    val cells = (1 to 40).map(i => s"term-$i" -> (i * 7L)).toMap
    val est = estMap(cells)
    cells.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t underestimated")
    }
    // 40 terms over 4x512 buckets: some depth row is collision-free
    // for every term (deterministic data, deterministic hashes)
    assert(cells.forall { case (t, c) => est(t) == c })
  }

  test("forced total collision: w=1 reads the whole mass for any term") {
    val cells = Map("a" -> 3L, "b" -> 5L, "c" -> 11L)
    val est = estMap(cells, d = 2, w = 1)
    assert(est.values.toSet == Set(19L))
  }

  test("depth monotonicity: min over more salted rows never grows") {
    val cells = (1 to 200).map(i => s"t$i" -> (i.toLong % 9 + 1)).toMap
    val e1 = estMap(cells, d = 1, w = 32)
    val e4 = estMap(cells, d = 4, w = 32)
    cells.keys.foreach(t => assert(e4(t) <= e1(t), t))
    // and with a crowded 32-bucket table, depth actually helps somewhere
    assert(cells.keys.exists(t => e4(t) < e1(t)))
  }

  test("merge identity: table(A) + table(B) == table(A with B's mass)") {
    val a = Map("x" -> 2L, "y" -> 3L, "z" -> 10L)
    val b = Map("y" -> 4L, "w" -> 1L)
    val union = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    val direct = CountMin.table(cellsOf(union)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaMerge = CountMin.merged(
      CountMin.table(cellsOf(a)), CountMin.table(cellsOf(b))).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(direct == viaMerge)
  }

  test("error bound: overestimate <= eps*N on a crowded table") {
    // 600 terms into w=512: collisions certain, bound must still hold
    val cells = (1 to 600).map(i => s"v$i" -> 5L).toMap
    val n = cells.values.sum
    val eps = math.E / 512
    val est = estMap(cells)
    val worst = cells.map { case (t, c) => est(t) - c }.max
    assert(worst <= (eps * n).ceil.toLong * 3, s"worst $worst") // slack 3x
  }

  test("registered q246 at sf0.001: 20 rows, invariant holds") {
    val rows = CountMin.partkeyCms(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("overestimate")) >= 0L)
      assert(r.getLong(r.fieldIndex("n_exact")) > 0L)
    }
  }
}
