package graft

import org.apache.spark.sql.{DataFrame, GraftSql, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GENERIC join-skew audit (r10 verdict #7) — the shuffle-join
  * counterpart of Round10WindowAuditSpec. A shuffled equi-join's task
  * work concentrates on its hottest key: when the max rows sharing one
  * key value grow ≳ linearly with the data on a NON-broadcast side,
  * that join is the straggler/OOM task in the making at 100 TB —
  * invisible to wall-clock at sf0.1 exactly like the window walls the
  * r9 verdict caught. This spec MEASURES it across the same 10× step:
  * for EVERY registered query, every logical equi-Join whose physical
  * plan shuffles (not BroadcastHashJoin/BroadcastNestedLoop — broadcast
  * sides never shuffle) has both children re-materialized at sf0.001
  * and sf0.01 and its largest single join-key group counted at both.
  * Growth ≥ 4 across the step on a non-trivial side (> 48 rows at
  * sf0.01) must be ALLOWLISTED with the structural bound that caps it —
  * the allowlist is the adjudication record, and anything newly flagged
  * fails the build.
  *
  * Because nearly everything broadcasts at test SFs, broadcast joins
  * are NOT simply skipped: a build side whose TOTAL row count grows
  * ≳ linearly past dimension grade (> 10k rows and ≥ 4× across the
  * step) is a FRAGILE broadcast — it stops broadcasting somewhere on
  * the way to 100 TB — so it gets the same skew screen (and a growing
  * non-equi join, which has no sane shuffle fallback, always flags).
  *
  * Logical↔physical pairing is by traversal position: the physical
  * planner maps each optimizedPlan Join to exactly one join exec, and
  * both trees collect in the same order (the window audit's cross-SF
  * technique, applied cross-layer).
  *
  * r11 baseline: ZERO flags — every registered join is either
  * key-bounded (orderkey/doc_id multiplicity), dimension-broadcast
  * with a bounded build side, or a candidate-generation join whose key
  * groups are planted-duplicate clusters that stay constant across the
  * step. r13 adds one adjudicated flag (q186's spine-lattice join,
  * below); the planted-hot-key self-test proves the screen detects
  * the failure mode it exists for.
  */
class Round11SkewAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val smallDir = "/root/testdata/sf0.001"
  val bigDir = "/root/testdata/sf0.01"

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  /** Equi-key pairs (leftKeys, rightKeys) of a logical join, or None
    * for pure cross/theta joins (those surface as nested-loop plans —
    * the broadcast screen and the 28-site crossJoin audit cover them). */
  private def equiKeys(j: Join): Option[(Seq[Expression], Seq[Expression])] = {
    val pairs = j.condition.toSeq.flatMap(splitConj).collect {
      case EqualTo(l, r) if l.references.subsetOf(j.left.outputSet) &&
        r.references.subsetOf(j.right.outputSet) => (l, r)
      case EqualTo(l, r) if r.references.subsetOf(j.left.outputSet) &&
        l.references.subsetOf(j.right.outputSet) => (r, l)
    }
    if (pairs.isEmpty) None else Some((pairs.map(_._1), pairs.map(_._2)))
  }

  /** Which logical side a broadcast join builds, or None if shuffled. */
  private def broadcastSide(p: SparkPlan): Option[String] = p match {
    case b: BroadcastHashJoinExec =>
      Some(if (b.buildSide == BuildLeft) "L" else "R")
    case b: BroadcastNestedLoopJoinExec =>
      Some(if (b.buildSide == BuildLeft) "L" else "R")
    case _ => None
  }

  /** (logical join, broadcast side or None) pairs for a query, deduped
    * by canonical children so shared-checkpoint self-joins audit once. */
  private def joinsOf(df: DataFrame): Seq[(Join, Option[String])] = {
    val logical = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    val physical = df.queryExecution.sparkPlan.collect {
      case p if p.nodeName.contains("Join") => p
    }
    assert(logical.size == physical.size,
      s"join count differs logical ${logical.size} vs physical ${physical.size}")
    val seen = scala.collection.mutable.Set[(Any, Any)]()
    logical.zip(physical).collect {
      case (j, p) if seen.add((j.left.canonicalized, j.right.canonicalized)) =>
        (j, broadcastSide(p))
    }
  }

  private val countCache = scala.collection.mutable.Map[Any, Long]()
  private def rowsOf(plan: LogicalPlan): Long =
    countCache.getOrElseUpdate(plan.canonicalized,
      GraftSql.ofRows(spark, plan).count())

  /** Max rows sharing one (non-null) key tuple on one side. */
  private def maxKeyRows(child: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      keys: Seq[Expression]): Long = {
    val df = GraftSql.ofRows(spark, child)
    val cols = keys.zipWithIndex.map { case (e, i) => GraftSql.column(e).as(s"k$i") }
    val keyed = df.select(cols: _*)
      .filter(cols.indices.map(i => col(s"k$i").isNotNull).reduce(_ && _))
    val agg = keyed.groupBy(cols.indices.map(i => col(s"k$i")): _*)
      .count().agg(max("count")).collect().head
    if (agg.isNullAt(0)) 0L else agg.getLong(0)
  }

  /** query → structural bound adjudicating its flagged join(s). */
  val allowlist: Map[String, String] = Map(
    "q186_cindex" -> ("the lattice join keys only on g (segment-grade)" +
      " but BOTH sides are spine frames, not subject rows: left =" +
      " distinct (g, dur) — bounded by the observation span (the q110" +
      " duration adjudication); right = distinct (g, s) — the" +
      " hundred-dollar balance grid (≤ ~110 cells). Per-key work is" +
      " span × grid, dimension-grade at any corpus size (r13)"))

  test("no un-adjudicated join grows a hot key or a fragile broadcast super-linearly") {
    val violations = scala.collection.mutable.ListBuffer[String]()
    val flagged = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      spark.sharedState.cacheManager.clearCache()
      val jsSmall = joinsOf(fn(spark, smallDir))
      val jsBig = joinsOf(fn(spark, bigDir))
      assert(jsSmall.size == jsBig.size,
        s"$name: join count differs across SFs" +
          s" (${jsSmall.size} vs ${jsBig.size})")

      def skewScreen(js: Join, jb: Join, i: Int, note: String): Unit =
        (equiKeys(js), equiKeys(jb)) match {
          case (Some((lkS, rkS)), Some((lkB, rkB))) =>
            Seq(("L", js.left, lkS, jb.left, lkB),
              ("R", js.right, rkS, jb.right, rkB)).foreach {
              case (side, chS, kS, chB, kB) =>
                val big = maxKeyRows(chB, kB)
                if (big > 48) { // trivial key groups can't wall at scale-up
                  val small = math.max(1L, maxKeyRows(chS, kS))
                  val ratio = big.toDouble / small
                  if (ratio >= 4.0) { // ≥ 4 on the 10× step ≈ linear growth
                    val desc = s"$name join#$i$note side $side keys " +
                      s"[${kB.map(_.sql).mkString(", ")}] " +
                      s"maxKey $small → $big (ratio ${"%.1f".format(ratio)})"
                    flagged += desc
                    if (!allowlist.contains(name)) violations += desc
                  }
                }
            }
          case _ =>
            // a growing non-equi join has no shuffle fallback — always flag
            val desc = s"$name join#$i$note non-equi with corpus-bound side"
            flagged += desc
            if (!allowlist.contains(name)) violations += desc
        }

      jsSmall.zip(jsBig).zipWithIndex.foreach {
        case (((js, _), (jb, bcastB)), i) =>
          bcastB match {
            case None => skewScreen(js, jb, i, "")
            case Some(side) =>
              // broadcast today — but will it still broadcast at 1000×?
              // a build side whose row count grows ≳ linearly past
              // dimension grade becomes a shuffled join at scale, so it
              // gets the same skew screen (flagged as fragile)
              val (chS, chB) =
                if (side == "L") (js.left, jb.left) else (js.right, jb.right)
              val bigRows = rowsOf(chB)
              if (bigRows > 10000 &&
                bigRows.toDouble / math.max(1L, rowsOf(chS)) >= 4.0)
                skewScreen(js, jb, i, s"[fragile-bcast $side=$bigRows rows]")
          }
      }
    }
    info(s"flagged (allowlisted) joins:\n  ${flagged.mkString("\n  ")}")
    assert(violations.isEmpty,
      "un-adjudicated skew/fragile-broadcast joins:\n  " +
        violations.mkString("\n  ") +
        "\nEither broadcast/salt/shard the join (bounded build side)" +
        " or allowlist it here with its structural bound.")
  }

  test("the audit catches a planted hot-key shuffled join") {
    import spark.implicits._
    // two fact-sized frames joined on a 3-value key, broadcast disabled
    // via merge hint — the canonical hot-key shuffle
    def fact(n: Int) = (1 to n).map(i => (i.toLong % 3, i.toLong))
      .toDF("k", "v")
    def hottest(df: DataFrame): Long = {
      val joins = joinsOf(df).collect { case (j, None) => j }
      assert(joins.nonEmpty, "planted join must not broadcast")
      val j = joins.head
      val Some((lk, _)) = equiKeys(j)
      maxKeyRows(j.left, lk)
    }
    val small = hottest(fact(300).hint("merge").join(fact(300), "k"))
    val big = hottest(fact(3000).hint("merge").join(fact(3000), "k"))
    assert(big > 48 && big.toDouble / small >= 4.0,
      s"audit failed to flag planted skew: $small → $big")
  }
}
