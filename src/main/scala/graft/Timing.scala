package graft

/** Shared measurement/formatting helpers for the driver-contract mains
  * (Bench, ScaleStudy, CorpusTimer) — one definition of the JSON number
  * format and the best-of-N timing loop, so a precision or locale
  * change can never silently diverge the artifacts. */
private[graft] object Timing {

  /** Locale-pinned centisecond formatting: "0.50", never "0,50" — the
    * driver's json.load would reject a comma decimal. */
  def cs(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  /** Best-of-N wall time of `body` in seconds — the minimum is the
    * standard robust statistic on a noisy shared host. */
  def bestOf(runs: Int)(body: => Unit): Double =
    (1 to runs).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.min
}
