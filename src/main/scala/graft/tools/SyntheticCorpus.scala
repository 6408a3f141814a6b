package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpora for scale-proofing the dedup/ANN
  * paths beyond the driver testdata (TESTDATA tops out at ~10k docs;
  * the 100 TB story needs 10-100× that locally).
  *
  * Everything derives from seeded integer hashes of the row id — no
  * RNG state, identical output on every run, every partition count,
  * every executor — so tests can assert exact ground truth.
  *
  * Dup staging: every [[DupEvery]]-th row is a near-duplicate of its
  * predecessor: documents append one extra unique word (shingle
  * Jaccard (W-2)/(W-1) ≈ 0.97 for W≥30 words, far above the 0.8
  * threshold); vectors perturb component 0 by +0.01 (cosine ≥ 0.999,
  * far above the 0.99 threshold, while random pairs sit near 0).
  * Ground truth near-dup pairs are exactly {(id-1, id) : id ≡
  * DupEvery-1 (mod DupEvery)}.
  */
object SyntheticCorpus {

  val DupEvery = 20
  val VocabSize = 500

  /** id of the row this row duplicates (itself when not a staged dup). */
  private def baseId(idCol: org.apache.spark.sql.Column) =
    when(pmod(idCol, lit(DupEvery.toLong)) === (DupEvery - 1).toLong, idCol - 1).otherwise(idCol)

  /** n deterministic documents (doc_id, text): 30-60 words drawn from
    * a 500-word vocabulary by hash of (base_id, position). Generation
    * is one distributed projection over spark.range — no driver data.
    */
  def docs(spark: SparkSession, n: Long): DataFrame = {
    val vocabCol = array((0 until VocabSize).map(i => lit(s"w$i")): _*)
    spark.range(n)
      .select(col("id").as("doc_id"), baseId(col("id")).as("base_id"))
      .withColumn("nw", (pmod(xxhash64(col("base_id"), lit(7)), lit(31L)) + 30L).cast("int"))
      .withColumn(
        "words",
        transform(
          sequence(lit(1), col("nw")),
          i => element_at(vocabCol, pmod(xxhash64(col("base_id"), i), lit(VocabSize.toLong)).cast("int") + 1)
        )
      )
      .withColumn(
        "words",
        when(
          col("doc_id") =!= col("base_id"),
          concat(col("words"), array(concat(lit("uniq"), col("doc_id"))))
        ).otherwise(col("words"))
      )
      .select(col("doc_id"), array_join(col("words"), " ").as("text"))
  }

  /** n deterministic embeddings (vec_id, embedding: array<float>),
    * components uniform-ish in [-1, 1] from hash of (base_id, dim).
    */
  def vectors(spark: SparkSession, n: Long, dim: Int): DataFrame =
    spark.range(n)
      .select(col("id").as("vec_id"), baseId(col("id")).as("base_id"))
      .withColumn(
        "embedding",
        transform(
          sequence(lit(0), lit(dim - 1)),
          d => ((pmod(xxhash64(col("base_id"), d), lit(2001L)) - 1000L) / lit(1000.0)).cast("float")
        )
      )
      .withColumn(
        "embedding",
        when(
          col("vec_id") =!= col("base_id"),
          transform(col("embedding"), (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x))
        ).otherwise(col("embedding"))
      )
      .select(col("vec_id"), col("embedding"))

  /** Zipf(s) quantile table over `vocab` ranks: entry k is the
    * 0-based rank whose CDF bucket contains (k+0.5)/bins. Driver-side,
    * tiny, deterministic — ships to executors as one literal array.
    */
  private def zipfQuantiles(vocab: Int, s: Double, bins: Int): Array[Int] = {
    val w = Array.tabulate(vocab)(r => math.pow((r + 1).toDouble, -s))
    val total = w.sum
    val cdf = w.scanLeft(0.0)(_ + _).drop(1).map(_ / total)
    val out = new Array[Int](bins)
    var r = 0
    var k = 0
    while (k < bins) {
      val u = (k + 0.5) / bins
      while (r < vocab - 1 && cdf(r) < u) r += 1
      out(k) = r
      k += 1
    }
    out
  }

  /** Zipf-vocabulary documents — same staged-dup structure as [[docs]]
    * (same [[DupEvery]]/[[stagedPairs]] ground truth) but words drawn
    * Zipf(s≈1.1) from a LARGE vocabulary instead of uniform from 500:
    * head words are near-universal, tail words discriminate — the
    * real-web frequency shape. Candidate-generation volume in
    * set-similarity dedup depends on this shape (the near-universal
    * HEAD drives shared-token candidates); this generator lets the
    * scale specs measure that delta against the uniform corpus
    * instead of assuming a direction.
    * Draw = hash → uniform bin → quantile-table inverse CDF (8k bins
    * quantize the tail but preserve the head/tail mass split exactly).
    */
  def zipfDocs(
      spark: SparkSession,
      n: Long,
      vocabSize: Int = 20000,
      s: Double = 1.1,
      bins: Int = 8192): DataFrame = {
    val q = zipfQuantiles(vocabSize, s, bins)
    val qWords = typedLit(q.map(r => "z" + r).toSeq)
    spark.range(n)
      .select(col("id").as("doc_id"), baseId(col("id")).as("base_id"))
      .withColumn("nw", (pmod(xxhash64(col("base_id"), lit(7)), lit(31L)) + 30L).cast("int"))
      .withColumn(
        "words",
        transform(
          sequence(lit(1), col("nw")),
          i => element_at(qWords, pmod(xxhash64(col("base_id"), i), lit(bins.toLong)).cast("int") + 1)
        )
      )
      .withColumn(
        "words",
        when(
          col("doc_id") =!= col("base_id"),
          concat(col("words"), array(concat(lit("uniq"), col("doc_id"))))
        ).otherwise(col("words"))
      )
      .select(col("doc_id"), array_join(col("words"), " ").as("text"))
  }

  /** Materialize the Zipf corpus like [[ensure]] does the uniform one. */
  def ensureZipf(spark: SparkSession, dir: String, nDocs: Long): String = {
    val path = s"$dir/zipf_docs_$nDocs"
    val have =
      try spark.read.parquet(path).count() == nDocs
      catch { case _: Throwable => false }
    if (!have) zipfDocs(spark, nDocs).repartition(8).write.mode("overwrite").parquet(path)
    path
  }

  /** Ground-truth staged near-dup pairs for a corpus of size n. */
  def stagedPairs(n: Long): Set[(Long, Long)] =
    ((DupEvery - 1).toLong until n by DupEvery.toLong).map(id => (id - 1, id)).toSet

  /** Materialize both corpora as parquet under `dir` (skipped when the
    * expected row counts are already there) so scans, pushdown and
    * fingerprint-keyed caches behave like a real table.
    */
  def ensure(spark: SparkSession, dir: String, nDocs: Long, nVecs: Long, dim: Int): (String, String) = {
    val docsPath = s"$dir/docs_$nDocs"
    val vecsPath = s"$dir/vecs_${nVecs}_$dim"
    def haveCount(path: String, expected: Long): Boolean =
      try spark.read.parquet(path).count() == expected
      catch { case _: Throwable => false }
    if (!haveCount(docsPath, nDocs))
      docs(spark, nDocs).repartition(8).write.mode("overwrite").parquet(docsPath)
    if (!haveCount(vecsPath, nVecs))
      vectors(spark, nVecs, dim).repartition(8).write.mode("overwrite").parquet(vecsPath)
    (docsPath, vecsPath)
  }
}
