package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomMightContain, CmsEstimate, Fingerprint64, MaxWordRep, MinHashSig, QuantizeI8, RandProject, RepStats, SimHash64Expr, TiffMetaExpr, VecDot, VecDotInt}

/** SQL-surface registration of graft's native expressions, injected
  * via SparkSessionExtensions (usable with
  * `--conf spark.sql.extensions=graft.GraftExtensions` on any cluster,
  * no code changes):
  *
  *   SELECT fingerprint64(text), simhash64(hashes),
  *          vec_dot(a, b), minhash_sig(hashes, 64) ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (
        FunctionIdentifier("fingerprint64"),
        info("fingerprint64", "fingerprint64(str) - FNV-1a 64-bit content fingerprint"),
        (exprs: Seq[Expression]) => Fingerprint64(exprs.head)
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("vec_dot"),
        info("vec_dot", "vec_dot(a, b) - double-precision dot product of float/double arrays"),
        (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("simhash64"),
        info("simhash64", "simhash64(hashes) - 64-bit SimHash from an array of word hashes"),
        (exprs: Seq[Expression]) => SimHash64Expr(exprs.head)
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("minhash_sig"),
        info("minhash_sig", "minhash_sig(hashes, k) - k-lane MinHash signature"),
        (exprs: Seq[Expression]) =>
          MinHashSig(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("max_word_rep"),
        info("max_word_rep", "max_word_rep(words) - max repetition count of any single word"),
        (exprs: Seq[Expression]) => MaxWordRep(exprs.head)
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("rep_stats"),
        info(
          "rep_stats",
          "rep_stats(words) - [n_words, top_word_rep, n_dup_words, top_bigram_rep] in one pass"
        ),
        (exprs: Seq[Expression]) => RepStats(exprs.head)
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("vec_dot_int"),
        info("vec_dot_int", "vec_dot_int(a, b) - exact Long dot product of int arrays"),
        (exprs: Seq[Expression]) => VecDotInt(exprs(0), exprs(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("quantize_i8"),
        info("quantize_i8", "quantize_i8(vec) - symmetric per-vector int8 quantization"),
        (exprs: Seq[Expression]) => QuantizeI8(exprs.head)
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("rand_project"),
        info("rand_project", "rand_project(vec, outDims) - fixed-point +-1 random projection"),
        (exprs: Seq[Expression]) =>
          RandProject(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("bloom_might_contain"),
        info("bloom_might_contain", "bloom_might_contain(bloom, key) - probe a serialized bloom filter"),
        (exprs: Seq[Expression]) => BloomMightContain(exprs(0), exprs(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("tiff_meta"),
        info("tiff_meta", "tiff_meta(bytes, maxEntries) - [is_tiff, byte_order, width, height] from a TIFF header/IFD (-1 = null)"),
        (exprs: Seq[Expression]) =>
          TiffMetaExpr(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("cms_estimate"),
        info("cms_estimate", "cms_estimate(cms, key) - Count-Min frequency estimate (never under)"),
        (exprs: Seq[Expression]) => CmsEstimate(exprs(0), exprs(1))
      )
    )
  }
}
