package graft.operators

/** Loud scale guard for the value-cell operator family (q108 gini,
  * q120 weighted quantiles, q123 lorenz, q126 winsorize, q141 psi).
  *
  * These plans collapse fact rows to (group, value) CELLS first — the
  * q47 quantize-first discipline — and then run ONE cumulative window
  * per group over its own cells. That is only bounded if the VALUE
  * DOMAIN is: clustered integer cents stay ~10⁵–10⁷ cells at any SF,
  * but a caller feeding a genuinely continuous column (floats with full
  * mantissa entropy) gets cells ≈ rows and silently rebuilds the
  * corpus-cardinality single-task window the family exists to avoid
  * (the r9 verdict's q141 failure mode). The guard makes that loud: a
  * runtime raise_error naming the operator and the fix, priced as a
  * count over the window spec the plan already has (same partition-only
  * frame as the group totals — no extra exchange, no extra pass).
  *
  * The default cap is 2²⁵ ≈ 3.4·10⁷ cells: one window task at that size
  * sorts ~1 GB — heavy but survivable; past it the plan is a design
  * error, not a big group. Mirrors cdfTable's integrality guard.
  */
object CellGuard {

  val DefaultMaxCells: Long = 1L << 25

  /** Boolean SQL guard over a per-group cell-count column: TRUE within
    * bound, raise_error past it. Use as a filter ABOVE the window that
    * produced `nCellsCol` (it references window output, so it cannot be
    * pushed below the partition it guards). */
  def sqlGuard(op: String, nCellsCol: String,
               maxCells: Long = DefaultMaxCells): String =
    s"(CASE WHEN $nCellsCol <= ${maxCells}L THEN TRUE ELSE" +
      s" isnull(raise_error(concat('$op: ', CAST($nCellsCol AS STRING)," +
      s" ' value cells in one group exceeds maxCells=$maxCells —" +
      s" the value column looks continuous; quantize it coarser" +
      s" (q47 discipline) or raise maxCells'))) END)"
}
