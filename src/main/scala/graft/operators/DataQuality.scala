package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** B50: declarative data-quality constraint checking — the validation
  * pass a warehouse runs after every sync before promoting a batch
  * (the reference trusts its row counts; production pipelines assert
  * constraints). Output is one row per rule: (rule, n_violations).
  *
  * Plan shapes, chosen per rule class so the whole report is a
  * constant number of linear passes at any scale:
  *   - row predicates: ALL rules against one table fuse into a SINGLE
  *     scan of conditional sums ([[predicateViolations]]) — N rules
  *     cost one pass, map-side-combined, fully codegen'd;
  *   - referential integrity: a LEFT ANTI join, broadcast when the
  *     parent is a dim table ([[fkViolations]]);
  *   - key uniqueness: one keyed agg counting surplus rows per key
  *     ([[dupKeyViolations]]) — shuffles only the key column.
  */
object DataQuality {

  /** All row-predicate rules for one table in ONE scan: each rule is a
    * conditional sum over the violation predicate.
    */
  def predicateViolations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = rules.map { case (name, bad) =>
      sum(when(bad, 1L).otherwise(0L)).as(name)
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(name).as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.*"))
  }

  /** Orphaned children: rows of `child` whose `childKey` has no match
    * in `parent.parentKey`. LEFT ANTI join — Catalyst broadcasts the
    * parent when it is dim-sized, and null child keys are counted as
    * violations too (an FK must be present AND resolvable).
    */
  def fkViolations(
      rule: String,
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String
  ): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(rule).as("rule"), col("n_violations"))

  /** Surplus rows under a uniqueness constraint: sum over keys of
    * (multiplicity - 1). 0 = the key is unique.
    */
  def dupKeyViolations(rule: String, df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("n_violations"))
      .select(lit(rule).as("rule"), col("n_violations"))

  /** A full report: union the per-rule frames, ordered by rule name. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_)).orderBy(col("rule"))

  /** B67: distribution-drift report between the older and newer half
    * of a table (split at the midpoint of the time column): fixed
    * equi-width bins over the full value range, per-bin reference and
    * current counts, and the per-bin rate shift in exact ppm — the
    * inputs a PSI/chi-square drift monitor consumes, kept integer so
    * the report is engine-exact. Detects the "new data stopped looking
    * like old data" failure a sync pipeline must alarm on before the
    * warehouse serves it.
    *
    * Plan: one 1-row global aggregate (broadcast) to fix the split
    * point and bin width, then ONE map-side-combined (bin) aggregation
    * over the fact table — two linear scans, no shuffle wider than
    * `bins` rows. `(v−lo)·bins div (hi−lo+1)` is always in [0, bins)
    * so no edge bin is special-cased, and Long `div` (not `/`) keeps
    * binning exact over the full cents range.
    */
  def driftReport(df: DataFrame, valueCents: Column, timeUs: Column, bins: Int = 16): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val o = df.select(valueCents.cast("long").as("v_c"), timeUs.cast("long").as("d_us"))
    val sp = o.agg(
      expr("(min(d_us) + max(d_us)) div 2L").as("mid"),
      min(col("v_c")).as("lo"),
      max(col("v_c")).as("hi"))
    val c = o
      .crossJoin(broadcast(sp))
      .select(
        expr(s"((v_c - lo) * ${bins.toLong}L) div (hi - lo + 1L)").as("bin"),
        when(col("d_us") <= col("mid"), 0L).otherwise(1L).as("side"))
      .groupBy(col("bin"))
      .agg(
        sum(when(col("side") === 0L, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("side") === 1L, 1L).otherwise(0L)).as("n_cur"))
    // totals via an unbounded window over the `bins`-row aggregate —
    // a re-aggregating join branch would re-scan the fact table
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    c.select(
        col("bin"), col("n_ref"), col("n_cur"),
        sum(col("n_ref")).over(all).as("tr"),
        sum(col("n_cur")).over(all).as("tc"))
      .select(
        col("bin"), col("n_ref"), col("n_cur"),
        expr("(n_cur * 1000000L) div tc - (n_ref * 1000000L) div tr").as("rate_diff_ppm"))
      .orderBy(col("bin"))
  }
}
