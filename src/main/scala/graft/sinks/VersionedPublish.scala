package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-audit-publish table commits that are safe on OBJECT STORES.
  *
  * [[PartitionedUpsert.promote]] relies on directory rename — atomic
  * on HDFS and local filesystems, but S3-style stores implement a
  * directory rename as per-object copy + delete: a crash mid-promote
  * leaves a half-moved table, and concurrent readers see a partial
  * listing. This object replaces the rename with a marker-file
  * protocol whose only "atomic" primitive is a single small-object
  * write — which every object store guarantees (one PUT):
  *
  *   tableDir/
  *     .v00001/            data files of version 1 (dot-prefixed:
  *                         hidden from naive full-dir reads, so a
  *                         reader that bypasses the pointer fails
  *                         loudly on an empty listing instead of
  *                         silently unioning every version)
  *     .v00001/_COMMITTED  audit marker: written only after the
  *                         caller's validation passed over a re-read
  *                         of the staged files
  *     _CURRENT            pointer file: "v00001\nEND\n" — flipped
  *                         LAST; the terminator line detects a
  *                         truncated write
  *
  * Publish = stage (write `.vN`) → audit (caller validation over a
  * re-read) → mark (`_COMMITTED`) → flip (`_CURRENT`). Readers resolve
  * `_CURRENT` and read exactly one version directory. Crash matrix:
  *
  *   - during stage/audit: no `_COMMITTED`, pointer untouched —
  *     readers keep the old version; the orphan dir is [[vacuum]]ed.
  *   - after `_COMMITTED`, before flip: pointer still names the old
  *     version — readers keep it (the batch re-publishes as vN+1).
  *   - mid-flip (truncated pointer, possible on POSIX/HDFS where
  *     create+write is not one atomic op): readers detect the missing
  *     terminator and fall back to the NEWEST version holding a
  *     `_COMMITTED` marker — which passed its audit by construction.
  *
  * No step ever exposes a partially-written or unvalidated version.
  */
object VersionedPublish {

  private val Pointer = "_CURRENT"
  private val Committed = "_COMMITTED"
  private val End = "END"
  private val VersionRe = "^\\.v(\\d{5})$".r

  private def versionDir(tableDir: Path, v: Int) = new Path(tableDir, f".v$v%05d")

  private def listVersions(fs: FileSystem, tableDir: Path): Seq[Int] =
    if (!fs.exists(tableDir)) Seq.empty
    else
      fs.listStatus(tableDir).toSeq.flatMap { st =>
        st.getPath.getName match {
          case VersionRe(n) if st.isDirectory => Some(n.toInt)
          case _ => None
        }
      }.sorted

  private def isCommitted(fs: FileSystem, tableDir: Path, v: Int): Boolean =
    fs.exists(new Path(versionDir(tableDir, v), Committed))

  private def writeSmallFile(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true) // overwrite: one PUT on an object store
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
  }

  private def readPointer(fs: FileSystem, tableDir: Path): Option[Int] = {
    val p = new Path(tableDir, Pointer)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val content =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toString("UTF-8")
      } finally in.close()
    content.split("\n", -1).toList match {
      case v :: End :: _ if v.matches("v\\d{5}") => Some(v.drop(1).toInt)
      case _ => None // truncated flip — caller falls back to markers
    }
  }

  /** The version directory a reader should use: the pointer when it is
    * intact AND names a committed version; otherwise the newest
    * committed version (mid-flip crash recovery). None = nothing has
    * ever been committed.
    */
  def currentVersion(fs: FileSystem, tableDir: String): Option[Int] = {
    val t = new Path(tableDir)
    readPointer(fs, t).filter(isCommitted(fs, t, _))
      .orElse(listVersions(fs, t).reverse.find(isCommitted(fs, t, _)))
  }

  /** Stage `df` as the next version, audit it, and publish. `validate`
    * runs over a RE-READ of the staged files (not the in-memory frame)
    * so it audits exactly the bytes readers will see; throw to abort —
    * the pointer is untouched and readers never observe the version.
    * Returns the published version number.
    */
  def publish(
      spark: SparkSession,
      df: DataFrame,
      tableDir: String,
      validate: DataFrame => Unit = _ => ()
  ): Int = {
    val t = new Path(tableDir)
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = listVersions(fs, t).lastOption.getOrElse(0) + 1
    val dir = versionDir(t, v)
    df.write.mode("overwrite").parquet(dir.toString)
    validate(spark.read.parquet(dir.toString)) // audit staged bytes
    writeSmallFile(fs, new Path(dir, Committed), s"$End\n")
    writeSmallFile(fs, new Path(t, Pointer), f"v$v%05d\n$End\n")
    v
  }

  /** Read the current committed version (fails loudly if none). */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val fs = new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = currentVersion(fs, tableDir).getOrElse(
      sys.error(s"VersionedPublish.read: no committed version under $tableDir"))
    spark.read.parquet(versionDir(new Path(tableDir), v).toString)
  }

  /** Drop old or never-committed version dirs, keeping the current
    * version plus `keep` committed predecessors (time-travel window).
    * Never touches the pointer's target.
    */
  def vacuum(spark: SparkSession, tableDir: String, keep: Int = 1): Unit = {
    val t = new Path(tableDir)
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    currentVersion(fs, tableDir).foreach { cur =>
      val committed = listVersions(fs, t).filter(isCommitted(fs, t, _))
      val protects = (committed.filter(_ <= cur).takeRight(keep + 1) :+ cur).toSet
      listVersions(fs, t).filterNot(protects).filter(_ < cur)
        .foreach(v => fs.delete(versionDir(t, v), true))
    }
  }
}
