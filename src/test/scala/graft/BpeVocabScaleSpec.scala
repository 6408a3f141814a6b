package graft

import org.apache.spark.sql.functions._
import org.scalatest.tagobjects.Slow

import graft.functions.{TokenTrie, VecOps}
import graft.operators.{Dedup, TextAnalysis}

/** C102 at production vocabulary scale: a real tokenizer ships ~50k
  * merges, not the 80-entry embedded table that pins the oracle
  * semantics. This spec builds a deterministic 50,000-entry merge
  * table, proves the trie kernel still matches a naive reference
  * walk, proves the node graph is built ONCE per JVM (tasks share the
  * process-wide cache — the vocabulary ships as strings, never as a
  * serialized pointer graph), and benches the sf1 documents scan
  * within 3× of the 80-entry kernel (VERDICT r10 item 3).
  */
class BpeVocabScaleSpec extends SparkSpec {

  /** Deterministic 50k merge table: every 2- and 3-letter combination
    * over a-z (676 + 17,576) topped up with 4-letter combinations in
    * lexicographic order — dense coverage of English-like text, so
    * the trie walk does real multi-level work on every word.
    */
  private lazy val vocab50k: Vector[String] = {
    val ls = ('a' to 'z').map(_.toString)
    val v2 = for { a <- ls; b <- ls } yield a + b
    val v3 = for { a <- ls; b <- ls; c <- ls } yield a + b + c
    val v4 = (for { a <- ls; b <- ls; c <- ls; d <- ls } yield a + b + c + d)
      .take(50000 - v2.size - v3.size)
    (v2 ++ v3 ++ v4).toVector
  }

  /** Naive reference: longest vocab entry matching at codepoint cursor. */
  private def naiveTokens(vocab: Set[String], maxLen: Int, s: String): (Long, Long, Long) = {
    var i = 0; var words = 1L; var tokens = 0L; var fb = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == ' ') { words += 1; i += 1 }
      else {
        val lim = math.min(maxLen, s.length - i)
        val m = (lim to 1 by -1).find(l => vocab.contains(s.substring(i, i + l))).getOrElse(0)
        if (m > 0) { tokens += 1; i += m }
        else { tokens += 1; fb += 1; i += Character.charCount(cp) }
      }
    }
    (words, tokens, fb)
  }

  test("50k-entry trie: kernel walk equals the naive reference, multi-byte included") {
    assert(vocab50k.size == 50000 && vocab50k.distinct.size == 50000)
    val trie = new TokenTrie(vocab50k)
    val vset = vocab50k.toSet
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "zzzz zzz zz z", // 4-, 3-, 2-letter matches + 1-cp fallback
      "abcd efgh ijkl mnopqrst", // dense 4-letter territory
      "数据 mixed 文本 with cjk", // multi-byte fallback path
      "a", "", "    spaced   out  ")
    for (s <- samples) {
      // replay the kernel loop with the real trie
      var i = 0; var words = 1L; var tokens = 0L; var fb = 0L
      while (i < s.length) {
        val cp = s.codePointAt(i)
        if (cp == ' ') { words += 1; i += 1 }
        else {
          val m = trie.longestMatch(s, i)
          if (m > 0) { tokens += 1; i += m }
          else { tokens += 1; fb += 1; i += Character.charCount(cp) }
        }
      }
      assert((words, tokens, fb) == naiveTokens(vset, 4, s), s"mismatch on '$s'")
    }
  }

  test("trie builds ONCE per JVM across plans and tasks: vocab ships, node graph does not") {
    import spark.implicits._
    // content distinct from vocab50k: the JVM-wide cache is keyed by
    // vocabulary fingerprint, and the correctness test above already
    // populated vocab50k's entry
    val vocabHere = vocab50k.dropRight(1) :+ "zzzzz"
    val before = TokenTrie.builds.get()
    def job(): Long = spark.range(0, 20000, 1, 32)
      .select(VecOps.greedy_token_stats(
        concat(lit("somewhat longer synthetic words here "), $"id".cast("string")), vocabHere)
        .getItem(1).as("t"))
      .agg(sum("t")).collect()(0).getLong(0)
    val t1 = job()
    val afterFirst = TokenTrie.builds.get()
    // a SECOND plan (new Expression instance, same vocabulary content)
    val t2 = job()
    val afterSecond = TokenTrie.builds.get()
    assert(t1 == t2 && t1 > 0)
    // 32 tasks × 2 plans = 64 potential rebuilds; the fingerprint cache
    // admits exactly one build for this vocabulary in this JVM
    assert(afterFirst - before == 1, s"expected exactly 1 build, got ${afterFirst - before}")
    assert(afterSecond - afterFirst == 0, s"second plan must hit the cache, got ${afterSecond - afterFirst} builds")
  }

  test("sf1 documents scan: 50k-merge tokenization within 3× of the 80-entry kernel", Slow) {
    val dir = "/tmp/graft_scale/sf1"
    assume(new java.io.File(s"$dir/documents.parquet").exists(), "sf1 scale data not staged")
    val docs = sources.Catalog.load(spark, dir, "documents")
    def timed(vocab: Seq[String]): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        docs.select(VecOps.greedy_token_stats(Dedup.normalize(col("text")), vocab).getItem(1).as("t"))
          .agg(sum("t")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once()) // warm best-of-2: drop codegen compile noise
    }
    val small = timed(TextAnalysis.BpeVocab)
    val big = timed(vocab50k)
    info(f"sf1 documents: 80-entry $small%.2fs, 50k-entry $big%.2fs (${big / small}%.2f×)")
    assert(big <= small * 3.0 + 0.5,
      f"50k-merge scan $big%.2fs exceeds 3× the 80-entry scan $small%.2fs")
  }
}
