package graft.streaming

/** Shared helpers for the replay-gate harnesses (q259/q311/q314+...).
  *
  * Harness cost is billed to every registered replay's bench reading,
  * so driver-side feed preparation must not do re-computed work. One
  * owner here, like [[LateStream.withShuffle4]].
  */
object Replay {

  /** Stable sort of a collected feed by Long key(s), with every key
    * computed ONCE per element. `Array.sortBy(f)` evaluates `f` on
    * every comparison — ~2·n·log n evaluations; with a `String.toLong`
    * parse in the key (the q332/q333/q334 scrambles) that measured
    * 1.6 s of the replay's 7 s at sf0.1, and tuple keys pay two
    * allocations per comparison. An index sort over precomputed key
    * arrays is the identical order (stable — ties keep input order,
    * exactly like `sortBy`) at array-lookup cost per comparison. */
  def sortedByLongs[E](feed: Array[E])(keyFns: (E => Long)*): IndexedSeq[E] = {
    val ks = keyFns.map(f => feed.map(f)).toArray
    val ord = new Ordering[Int] {
      def compare(a: Int, b: Int): Int = {
        var j = 0
        while (j < ks.length) {
          val c = java.lang.Long.compare(ks(j)(a), ks(j)(b))
          if (c != 0) return c
          j += 1
        }
        0
      }
    }
    feed.indices.sorted(ord).map(feed)
  }

  /** The q259 deterministic Knuth scramble over a single Long key. */
  def knuthSorted[E](feed: Array[E])(keyOf: E => Long): IndexedSeq[E] =
    sortedByLongs(feed)(keyOf)
}
