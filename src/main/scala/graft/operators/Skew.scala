package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB joins.
  *
  * AQE's skew-join splitting (on in `graft.Engine`) handles most skew at
  * runtime by splitting oversized partitions — prefer it. [[saltedJoin]]
  * is the explicit fallback for the case AQE cannot fix: a single join
  * key so hot (null-heavy foreign keys, a "default" id, a celebrity
  * user) that ONE key exceeds an executor, since AQE can split a
  * partition but never a key.
  *
  * Mechanics: the fact side gets a uniform random-ish salt in
  * [0, buckets) derived deterministically from its row content hash (so
  * re-runs are stable); the dimension side is exploded `buckets`× with
  * every salt value; the join key becomes (key, salt). The hot key's
  * rows now spread over `buckets` reducers. Dimension duplication costs
  * buckets×|dim| — use for small-to-medium dims, which is exactly where
  * hot-key fact joins occur.
  */
object Skew {

  /** Inner-join `fact` with `dim` on `key`, salting the key `buckets`
    * ways. Result columns = fact.* then dim.* minus its join key. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 1, "salting needs at least 2 buckets")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "input already has a __salt column")
    val shared = fact.columns.toSet.intersect(dim.columns.toSet) - key
    require(shared.isEmpty,
      s"fact and dim share non-key columns ${shared.mkString(", ")}; rename before joining")
    // salt mixes row content with a positional uniquifier: hot keys are
    // usually byte-identical rows, and a content-only hash would send
    // them all to ONE salt, defeating the spread. The salt never reaches
    // the output, so its run-to-run instability cannot leak into results.
    val salted = fact.withColumn("__salt",
      pmod(xxhash64((fact.columns.map(col) :+ monotonically_increasing_id()).toIndexedSeq: _*),
        lit(buckets)).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    val dimCols = dim.columns.filterNot(_ == key)
    salted
      .join(explodedDim, Seq(key, "__salt"))
      .select((fact.columns ++ dimCols).map(col).toIndexedSeq: _*)
  }
}
