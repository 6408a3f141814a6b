package graft.tools

import org.apache.spark.sql.DataFrame

/** Plan observability: the shape properties this engine treats as
  * contracts (shuffle count, broadcast vs sort-merge joins, scan-level
  * filter pushdown, whole-stage codegen coverage) extracted as DATA, so
  * jobs can assert them at runtime the way PlanSpec asserts them in CI.
  * At 100 TB a plan regression (a broadcast that silently became a
  * sort-merge join, a filter that stopped reaching the scan) costs more
  * than any single bug — [[lint]] turns those into loud failures at
  * submit time, before the cluster burns a day proving it.
  */
object PlanDigest {

  final case class Digest(
      exchanges: Int,
      broadcastJoins: Int,
      sortMergeJoins: Int,
      nestedLoopJoins: Int,
      codegenStages: Int,
      scans: Int,
      scansWithPushedFilters: Int,
      cartesian: Boolean
  )

  private def count(hay: String, needle: String): Int = {
    var (n, i) = (0, hay.indexOf(needle))
    while (i >= 0) { n += 1; i = hay.indexOf(needle, i + needle.length) }
    n
  }

  /** Digest of the physical plan as currently committed. Under AQE a
    * plan printed AFTER execution shows both "Final Plan" and
    * "Initial Plan" sections — only the final one is counted, so
    * pre-launch lint and post-run inspection read the same way.
    * `exchanges` counts SHUFFLE exchanges only (hash/range/single
    * partitioning) — BroadcastExchange is the cheap kind and is
    * visible through `broadcastJoins` instead.
    */
  def digest(df: DataFrame): Digest = {
    val full = df.queryExecution.executedPlan.toString
    val p = {
      val fin = full.indexOf("== Final Plan ==")
      val ini = full.indexOf("== Initial Plan ==")
      if (fin >= 0 && ini > fin) full.substring(fin, ini) else full
    }
    val scanLines = p.linesIterator.filter(_.contains("FileScan")).toSeq
    // a whole-stage-codegen stage renders as a "*(n)" operator prefix,
    // never as a literal node name — count distinct stage ids
    val codegenIds = "\\*\\((\\d+)\\)".r.findAllMatchIn(p).map(_.group(1)).toSet
    Digest(
      exchanges = count(p, "Exchange hashpartitioning") +
        count(p, "Exchange rangepartitioning") + count(p, "Exchange SinglePartition"),
      broadcastJoins = count(p, "BroadcastHashJoin"),
      sortMergeJoins = count(p, "SortMergeJoin"),
      nestedLoopJoins = count(p, "BroadcastNestedLoopJoin"),
      codegenStages = codegenIds.size,
      scans = scanLines.size,
      scansWithPushedFilters =
        scanLines.count(l => l.contains("PushedFilters: [") && !l.contains("PushedFilters: []")),
      cartesian = p.contains("CartesianProduct")
    )
  }

  /** Fail-fast plan contract: throws (naming the violated bound and the
    * offending plan head) instead of submitting a job whose shape has
    * regressed. Bounds are inclusive maxima; `allowCartesian` defaults
    * to the only safe answer.
    */
  def lint(
      df: DataFrame,
      maxExchanges: Int = Int.MaxValue,
      maxSortMergeJoins: Int = Int.MaxValue,
      minBroadcastJoins: Int = 0,
      allowCartesian: Boolean = false
  ): Digest = {
    val d = digest(df)
    def fail(what: String): Nothing =
      throw new IllegalStateException(
        s"plan lint failed: $what (digest: $d)\n" +
          df.queryExecution.executedPlan.toString.linesIterator.take(15).mkString("\n"))
    if (d.exchanges > maxExchanges) fail(s"${d.exchanges} exchanges > $maxExchanges allowed")
    if (d.sortMergeJoins > maxSortMergeJoins)
      fail(s"${d.sortMergeJoins} sort-merge joins > $maxSortMergeJoins allowed")
    if (d.broadcastJoins < minBroadcastJoins)
      fail(s"${d.broadcastJoins} broadcast joins < $minBroadcastJoins required")
    if (d.cartesian && !allowCartesian) fail("plan contains a CartesianProduct")
    d
  }
}
