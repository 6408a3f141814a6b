package graft.sync

import org.apache.spark.sql.SparkSession

/** Deployment entry point — the reference's `main()` flag surface
  * (es_to_bytehouse.py:1210-1269: `--pattern/-p`, `--list-only/-l`,
  * `--index/-i`, `--mode/-m full|incremental|continuous`,
  * `--interval`) bound onto [[SyncRunner]] over parquet lakes.
  *
  * Flags not in the reference: `--src/--target/--state` locate the
  * lake dirs (the reference hard-wires endpoints via env vars — env
  * fallbacks `GRAFT_SRC/GRAFT_TARGET/GRAFT_STATE` keep that shape),
  * and `--passes` bounds the continuous loop (the reference loops
  * forever; a bound makes the loop testable and cron-able).
  */
object SyncCli {

  final case class Config(
      mode: String = "incremental",
      pattern: String = "*",
      index: Option[String] = None,
      listOnly: Boolean = false,
      srcDir: String = "",
      targetRoot: String = "",
      stateDir: String = "",
      intervalSec: Int = 300,
      maxPasses: Int = Int.MaxValue
  ) {
    /** `--index` overrides `--pattern`, exactly like the reference. */
    def effectivePattern: String = index.getOrElse(pattern)
  }

  val modes = Set("full", "incremental", "continuous", "auto")

  /** Pure argument parser (unit-testable without a session). Throws
    * IllegalArgumentException with a usage-style message on bad input.
    */
  def parse(args: Array[String], env: Map[String, String] = sys.env): Config = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"$msg\nusage: SyncCli --src DIR --target DIR --state DIR " +
          "[--mode full|incremental|continuous|auto] [--pattern GLOB] " +
          "[--index NAME] [--list-only] [--interval SEC] [--passes N]")
    @annotation.tailrec
    def go(rest: List[String], c: Config): Config = rest match {
      case Nil => c
      case ("--mode" | "-m") :: m :: t =>
        if (!modes.contains(m)) fail(s"unknown mode '$m'")
        go(t, c.copy(mode = m))
      case ("--pattern" | "-p") :: p :: t => go(t, c.copy(pattern = p))
      case ("--index" | "-i") :: i :: t => go(t, c.copy(index = Some(i)))
      case ("--list-only" | "-l") :: t => go(t, c.copy(listOnly = true))
      case "--src" :: d :: t => go(t, c.copy(srcDir = d))
      case "--target" :: d :: t => go(t, c.copy(targetRoot = d))
      case "--state" :: d :: t => go(t, c.copy(stateDir = d))
      case "--interval" :: s :: t =>
        val v = s.toIntOption.getOrElse(fail(s"--interval needs an int, got '$s'"))
        if (v < 0) fail("--interval must be >= 0")
        go(t, c.copy(intervalSec = v))
      case "--passes" :: s :: t =>
        val v = s.toIntOption.getOrElse(fail(s"--passes needs an int, got '$s'"))
        if (v < 1) fail("--passes must be >= 1")
        go(t, c.copy(maxPasses = v))
      case other :: _ => fail(s"unknown argument '$other'")
    }
    val base = Config(
      srcDir = env.getOrElse("GRAFT_SRC", ""),
      targetRoot = env.getOrElse("GRAFT_TARGET", ""),
      stateDir = env.getOrElse("GRAFT_STATE", ""))
    val c = go(args.toList, base)
    if (c.srcDir.isEmpty) fail("--src (or GRAFT_SRC) is required")
    if (!c.listOnly) {
      if (c.targetRoot.isEmpty) fail("--target (or GRAFT_TARGET) is required")
      if (c.stateDir.isEmpty) fail("--state (or GRAFT_STATE) is required")
    }
    c
  }

  /** Dispatch one parsed config onto [[SyncRunner]]. Separated from
    * [[main]] so tests drive it with their own session and clock.
    * Returns per-pass, per-table (mode, rows) — empty for list-only.
    */
  def run(
      spark: SparkSession,
      c: Config,
      nowUsForPass: Int => Long = _ => System.currentTimeMillis() * 1000L,
      alerter: Option[Alerts.Alerter] = None,
      onList: Seq[String] => Unit = ts => ts.foreach(println)
  ): Seq[Map[String, (String, Long)]] = {
    if (c.listOnly) {
      onList(graft.sources.Catalog.selectTables(spark, c.srcDir, c.effectivePattern))
      return Nil
    }
    val probe = Some(() => Health.probePath(spark, c.srcDir))
    c.mode match {
      case "full" =>
        Seq(SyncRunner.autoSyncAll(spark, c.srcDir, c.effectivePattern, c.targetRoot,
          c.stateDir, nowUsForPass(1), forceFull = true))
      case "incremental" | "auto" =>
        // one auto pass: tables without state do their first full load,
        // the rest sync incrementally — the reference's run_incremental
        // falls back to full the same way on a fresh index
        Seq(SyncRunner.autoSyncAll(spark, c.srcDir, c.effectivePattern, c.targetRoot,
          c.stateDir, nowUsForPass(1)))
      case "continuous" =>
        SyncRunner.runContinuous(spark, c.srcDir, c.effectivePattern, c.targetRoot,
          c.stateDir, c.maxPasses, c.intervalSec * 1000L, nowUsForPass,
          alerter = alerter, preflight = probe)
      case other => throw new IllegalArgumentException(s"unknown mode '$other'")
    }
  }

  def main(args: Array[String]): Unit = {
    val c = parse(args)
    val spark = graft.GraftSession.builder().getOrCreate()
    try {
      val results = run(spark, c)
      results.zipWithIndex.foreach { case (pass, i) =>
        pass.foreach { case (table, (mode, n)) =>
          println(s"[sync] pass ${i + 1} $table: $mode $n rows")
        }
      }
    } finally spark.stop()
  }
}
