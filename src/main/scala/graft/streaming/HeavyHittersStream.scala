package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — the continuous twin of
  * [[graft.textstats.TextStats.heavyHitters]] with BOUNDED state: a
  * Misra–Gries summary per term-hash partition instead of one counter
  * per distinct term (an open-vocabulary stream would otherwise grow
  * state without limit). Classic guarantees (Misra & Gries 1982): with
  * capacity C per group, any term whose true frequency exceeds
  * N_group/(C+1) is guaranteed present, and every emitted count is a
  * lower bound with `upper = lower + decrements` an upper bound.
  *
  * Terms are routed to groups by term hash, so a term's counters live
  * in exactly ONE group — global top-k is a plain union + top over the
  * emitted summaries, no cross-group merging. State per group is ≤ C
  * counters regardless of stream length.
  */
object HeavyHittersStream {

  case class TokRow(part: Int, term: String)
  case class MgState(counters: Map[String, Long], decs: Long)
  /** `lower` ≤ true count ≤ `upper` (within this group's substream). */
  case class MgCounter(part: Int, term: String, lower: Long, upper: Long)

  val Capacity = 32
  val Partitions = 16

  /** Stateless tokenizer front end: streaming docs → (part, term) rows,
    * part = term-hash bucket so each term has a single home group. */
  def tokenStream(docs: DataFrame, partitions: Int = Partitions): Dataset[TokRow] = {
    import docs.sparkSession.implicits._
    docs
      .select(explode(split(col("text"), " ")).as("term"))
      .select(pmod(xxhash64(col("term")), lit(partitions)).cast("int").as("part"),
        col("term"))
      .as[TokRow]
  }

  /** Misra–Gries per group: hits increment; a miss with a full table
    * decrements every counter (dropping zeros) and discards the
    * arrival. Emits the group's full summary each trigger (Update
    * mode); `upper - lower` is the group's decrement total. */
  def heavyHitters(toks: Dataset[TokRow], capacity: Int = Capacity): Dataset[MgCounter] = {
    import toks.sparkSession.implicits._
    toks
      .groupByKey(_.part)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (part: Int, rows: Iterator[TokRow], state: GroupState[MgState]) => {
          var (counters, decs) = state.getOption
            .map(s => (s.counters, s.decs))
            .getOrElse((Map.empty[String, Long], 0L))
          rows.foreach { r =>
            counters.get(r.term) match {
              case Some(c) => counters = counters.updated(r.term, c + 1)
              case None if counters.size < capacity =>
                counters = counters.updated(r.term, 1L)
              case None =>
                decs += 1
                counters = counters.flatMap { case (t, c) =>
                  if (c > 1) Some(t -> (c - 1)) else None
                }
            }
          }
          state.update(MgState(counters, decs))
          counters.iterator.map { case (t, c) => MgCounter(part, t, c, c + decs) }
        })
  }
}
