package graft

import org.apache.spark.sql.functions._
import org.scalatest.tagobjects.Slow

import graft.operators.{Dedup, Similarity}
import graft.tools.SyntheticCorpus

/** Scale-proof suite: the blocked/banded paths must beat their exact
  * baselines by construction, not by assertion on 500 rows. Corpora
  * are deterministic synthetics (ground truth known exactly); sizes
  * are 10-200× the driver testdata. Tagged Slow — these are minutes,
  * not seconds, and exist to demonstrate the 100 TB shape locally.
  */
class ScaleSpec extends SparkSpec {

  private val corpusDir = "target/scale_corpus"

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  test("embedding dedup: LSH-blocked path is sublinear vs exact all-pairs at 20k vectors", Slow) {
    val (_, vecsPath) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 1000, nVecs = 20000, dim = 32)
    val vecs = spark.read.parquet(vecsPath)
    val truth = SyntheticCorpus.stagedPairs(20000)

    val (exactPairs, exactSec) = time {
      Dedup.embeddingPairs(vecs, "vec_id", "embedding", tau = 0.99)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // 4 tables suffice here: staged twins sit at cos >= 0.999 (angle
    // ~0.045 rad), per-table collision ~0.89, miss ~ (1-0.89)^4 ≈ 1e-4
    def lshOnce() = time {
      Dedup.embeddingPairsLsh(vecs, "vec_id", "embedding", tau = 0.99, dim = 32, planes = 8, tables = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // min-of-2 on the small number only: a noisy-neighbor hiccup on a
    // 5s measurement must not fail a 5x-headroom ratio assertion
    val (lshPairs, lshSec1) = lshOnce()
    val lshSec = math.min(lshSec1, lshOnce()._2)
    info(f"exact all-pairs: $exactSec%.1fs, ${exactPairs.size} pairs; LSH-blocked: $lshSec%.1fs, ${lshPairs.size} pairs")
    assert(exactPairs == truth, "exact all-pairs must find exactly the staged dups")
    assert(lshPairs.subsetOf(exactPairs), "exact verification admits no false positives")
    val recall = (truth intersect lshPairs).size.toDouble / truth.size
    assert(recall >= 0.99, s"LSH-blocked recall too low at scale: $recall")
    // the scale claim: candidate generation is keyed, not quadratic —
    // at 20k vectors the blocked path must already be >4x faster
    assert(lshSec < 0.25 * exactSec, f"LSH-blocked not sublinear: $lshSec%.1fs vs exact $exactSec%.1fs")
  }

  test("simhash sketch prefilter at 20k clustered vectors: same pairs as LSH path, mid-sim candidates rejected pre-fetch", Slow) {
    import spark.implicits._
    val dim = 16
    val nAnchors = 50
    val rnd = new scala.util.Random(23)
    val anchors = Array.fill(nAnchors)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val anchorsDf = broadcast(
      anchors.zipWithIndex.map { case (a, i) => (i.toLong, a.map(_.toFloat)) }.toIndexedSeq
        .toDF("aid", "avec"))
    // loose clusters: within-cluster cos ~0.75-0.85 — the shape that
    // floods LSH buckets with candidates BELOW tau, where the sketch
    // prefilter earns its keep; every 20th vector gets a near-twin
    val vecs = spark.range(0, 20000)
      .select(col("id").as("vec_id"), pmod(col("id"), lit(nAnchors.toLong)).as("aid"))
      .join(anchorsDf, "aid")
      .select(col("vec_id"),
        zip_with(col("avec"), sequence(lit(0), lit(dim - 1)), (x, i) =>
          (x + ((pmod(xxhash64(col("vec_id"), i), lit(1601L)) - 800L) / lit(1000.0))).cast("float"))
          .as("embedding"))
    val twins = vecs.filter(pmod(col("vec_id"), lit(20L)) === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x)).as("embedding"))
    val corpus = vecs.unionByName(twins).persist()
    corpus.count()
    def asPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tau = 0.99
    val (viaLsh, lshSec) = time {
      asPairs(Dedup.embeddingPairsLsh(corpus, "vec_id", "embedding", tau, dim, planes = 8, tables = 8))
    }
    val (viaSketch, skSec) = time {
      asPairs(Dedup.embeddingPairsLshSketch(corpus, "vec_id", "embedding", tau, dim, planes = 8, tables = 8))
    }
    assert(viaSketch == viaLsh,
      s"sketch path drifted: missing=${viaLsh.diff(viaSketch).take(5)} extra=${viaSketch.diff(viaLsh).take(5)}")
    // every staged twin recovered through the sketch gate
    val twinPairs = (0L until 20000L by 20L).map(i => (i, i + 100000L)).toSet
    assert(twinPairs.subsetOf(viaSketch), s"missing twins: ${twinPairs.diff(viaSketch).take(5)}")
    val (total, kept) = Dedup.sketchPrefilterStats(corpus, "vec_id", "embedding", tau, dim, planes = 8, tables = 8)
    info(f"lsh $lshSec%.1fs, sketch $skSec%.1fs; candidates $total -> $kept after sketch (${100.0 * kept / total}%.1f%% kept)")
    // the measurement the operator exists for: most mid-similarity
    // candidates never reach the vector fetch
    assert(total > 0 && kept * 2 <= total, s"sketch rejected too little: $kept of $total")
    corpus.unpersist()
  }

  test("semantic dedup at 20k vectors: co-clustered twins all pruned, decisions exact", Slow) {
    val (_, vecsPath) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 1000, nVecs = 20000, dim = 32)
    // 64 sign-structured labels (sign bits of dims 1-6): centroids are
    // genuinely separated, assignments follow the space — the
    // production shape, where clusters come from k-means over content
    val labeled = spark.read.parquet(vecsPath).withColumn("label",
      (0 until 6).map(d =>
        when(element_at(col("embedding"), d + 1) >= 0f, lit(1L << d)).otherwise(lit(0L)))
        .reduce(_ + _))
    val (rows, sec) = time {
      Dedup.semanticDedup(labeled, "vec_id", "embedding", "label",
        tau = 0.99, dim = 32, planes = 8, tables = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    info(f"semanticDedup over 20k vectors x 64 clusters: $sec%.1fs")
    assert(rows.length == 20000, "one keep/drop decision per vector")
    val cluster = rows.map(r => r._1 -> r._2).toMap
    val twins = SyntheticCorpus.stagedPairs(20000)
    val coclustered = twins.filter { case (a, b) => cluster(a) == cluster(b) }
    // the +0.01 dim-0 perturbation can only flip a twin across a
    // sign-structured boundary when |x_0| < 0.01 (~0.5%)
    assert(coclustered.size >= (twins.size * 0.95).toInt,
      s"twins should co-cluster: ${coclustered.size}/${twins.size}")
    val dropped = rows.filter(_._3 == 0L).map(_._1).toSet
    val missed = coclustered.filterNot { case (_, b) => dropped(b) }
    assert(missed.isEmpty, s"co-clustered twins must be pruned, missed: ${missed.take(5)}")
    // drops beyond the staged twins can only be exact-verified natural
    // tau-pairs (the cosine filter admits no false positives); at
    // dim=32 those are a thin tail
    val extra = dropped -- coclustered.map(_._2)
    assert(extra.size <= twins.size / 20, s"too many non-staged drops: ${extra.size}")
  }

  test("minhash-LSH dedup at 100k docs: exact staged recovery, keyed-join runtime", Slow) {
    val (docsPath, _) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 100000, nVecs = 20000, dim = 32)
    val docs = spark.read.parquet(docsPath)
    val truth = SyntheticCorpus.stagedPairs(100000)

    val (pairs, sec) = time {
      Dedup.minhashLshPairs(docs, "doc_id", "text", k = 64, bands = 16, tauPct = 80)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    info(f"minhash-LSH over 100k docs: $sec%.1fs, ${pairs.size} pairs (${truth.size} staged)")
    assert(pairs == truth, s"minhash-LSH must recover exactly the staged dup pairs " +
      s"(missed ${(truth -- pairs).size}, extra ${(pairs -- truth).size})")
  }

  test("passage dedup at 100k docs: exactly the staged dup docs flagged", Slow) {
    val (docsPath, _) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 100000, nVecs = 20000, dim = 32)
    val docs = spark.read.parquet(docsPath)
    // every staged dup doc shares all of its base's full 8-word
    // passages (the appended uniq token only perturbs the tail block),
    // and unrelated docs share no 8-gram (vocab^8 space): the flagged
    // set must be exactly the union of staged pairs
    val dupDocs = SyntheticCorpus.stagedPairs(100000).flatMap(p => Seq(p._1, p._2))
    val (flagged, sec) = time {
      Dedup.passageDupStats(docs, "doc_id", "text", window = 8)
        .filter(col("n_dup_passages") > 0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    info(f"passage dedup over 100k docs: $sec%.1fs, ${flagged.size} docs flagged")
    assert(flagged == dupDocs,
      s"missed ${(dupDocs -- flagged).size}, extra ${(flagged -- dupDocs).size}")
  }

  test("prefix-filtered exact n-gram Jaccard at 100k docs: exact staged recovery", Slow) {
    val (docsPath, _) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 100000, nVecs = 20000, dim = 32)
    val docs = spark.read.parquet(docsPath)
    val truth = SyntheticCorpus.stagedPairs(100000)
    val (pairs, sec) = time {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, tauPct = 80)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    info(f"prefix-filtered exact join over 100k docs: $sec%.1fs, ${pairs.size} pairs")
    // the EXACT algorithm must recover exactly the staged dups — the
    // prefix filter is lossless by theorem, this is the empirical check
    assert(pairs == truth, s"prefix filter lost pairs: missed ${(truth -- pairs).size}, " +
      s"extra ${(pairs -- truth).size}")
  }

  test("IVF at nClusters=1024: broadcast-join assignment, persisted index, decent recall", Slow) {
    val (_, vecsPath) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 1000, nVecs = 100000, dim = 32)
    val vecs = spark.read.parquet(vecsPath)
    val queries = vecs.filter(col("vec_id") < 20)
    val indexDir = s"$corpusDir/ivf_100k_1024"

    val (_, fitSec) = time {
      Similarity.buildIvfIndex(spark, vecs, "vec_id", "embedding", nClusters = 1024, indexDir)
    }
    // the on-disk index really is cell-partitioned at this width
    val cellDirs = new java.io.File(s"$indexDir/cells").listFiles().count(_.getName.startsWith("cell="))
    assert(cellDirs > 64, s"expected hundreds of cell dirs, got $cellDirs")

    val (ivf, searchSec) = time {
      Similarity.ivfTopKIndexed(spark, indexDir, queries, "vec_id", "embedding", k = 10, nProbes = 64)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    }
    val (brute, bruteSec) = time {
      Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    }
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(f"IVF(1024) fit+build: $fitSec%.1fs, search: $searchSec%.1fs, brute: $bruteSec%.1fs, recall@10: $recall%.2f")
    // NB: at 100k x 32-dim, brute force is trivially fast — IVF's win
    // is IO-bounded probing (64/1024 of the index read per query),
    // which pays off when the corpus doesn't fit an executor. What
    // this asserts is that the 1024-cell path WORKS: join-based
    // assignment, hundreds of partition dirs, full k results, recall.
    assert(ivf.size == brute.size, "every query must fill k results at this probe width")
    assert(recall >= 0.5, s"IVF recall too low: $recall (nProbes=64/1024)")
  }

  test("LSH ANN at 100k vectors: staged twin found first, subset of brute candidates", Slow) {
    val (_, vecsPath) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 1000, nVecs = 100000, dim = 32)
    val vecs = spark.read.parquet(vecsPath)
    // staged dup ids: their nearest neighbor is known exactly (the base)
    val queries = vecs.filter(pmod(col("vec_id"), lit(20L)) === 19L && col("vec_id") < 400L)
    val (lsh, sec) = time {
      Similarity.lshTopK(vecs, queries, "vec_id", "embedding", k = 1, dim = 32, planes = 8, tables = 8)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    }
    info(f"LSH ANN over 100k vectors, ${lsh.size} queries: $sec%.1fs")
    // rank-1 neighbor of a staged dup must be its base vector
    val hits = lsh.count { case (qid, nid) => nid == qid - 1 }
    assert(hits >= (lsh.size * 0.95).toInt, s"LSH missed staged twins: $hits/${lsh.size}")
  }

  test("graph ANN at 100k vectors: staged twin found first through the persisted graph; build linear-blocked", Slow) {
    val (_, vecsPath) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 1000, nVecs = 100000, dim = 32)
    val vecs = spark.read.parquet(vecsPath)
    val dir = "target/scale_hnsw_100k"
    val (_, buildSec) = time {
      Similarity.buildGraphIndex(spark, vecs, "vec_id", "embedding", indexDir = dir, m = 16)
    }
    // auto-blocking: ~n/256 cells — build work is Σ block² ≈ n·512,
    // LINEAR in corpus size (a fixed cell count would be quadratic)
    val nEntries = spark.read.parquet(s"$dir/entries").count()
    assert(nEntries >= 300 && nEntries <= 500, s"auto cell count off: $nEntries")
    val queries = vecs.filter(pmod(col("vec_id"), lit(20L)) === 19L && col("vec_id") < 400L)
    val (got, sec) = time {
      Similarity.graphTopK(spark, dir, queries, "vec_id", "embedding", k = 1)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    }
    info(f"graph ANN over 100k vectors: build $buildSec%.1fs, probe of ${got.size} queries $sec%.1fs")
    // rank-1 neighbor of a staged dup must be its base vector (cosine
    // >= 0.999 by construction — the twin-finding contract)
    val hits = got.count { case (qid, nid) => nid == qid - 1 }
    assert(hits >= (got.size * 0.95).toInt, s"graph ANN missed staged twins: $hits/${got.size}")
  }

  test("IVF range search at 100k clustered vectors: bit-identical to brute scan, prune collapses probed cells", Slow) {
    import spark.implicits._
    val dim = 8
    val nAnchors = 64
    val rnd = new scala.util.Random(11)
    val anchors = Array.fill(nAnchors)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val anchorsDf = broadcast(
      anchors.zipWithIndex.map { case (a, i) => (i.toLong, a.map(_.toFloat)) }.toIndexedSeq
        .toDF("aid", "avec"))
    // 100k members in 64 tight clusters: anchor + hash noise (±0.05)
    val vecs = spark.range(0, 100000)
      .select(col("id").as("vec_id"), pmod(col("id"), lit(nAnchors.toLong)).as("aid"))
      .join(anchorsDf, "aid")
      .select(col("vec_id"),
        zip_with(col("avec"), sequence(lit(0), lit(dim - 1)), (x, i) =>
          (x + ((pmod(xxhash64(col("vec_id"), i), lit(201L)) - 100L) / lit(2000.0))).cast("float"))
          .as("embedding"))
      .persist()
    val queries = vecs.filter(col("vec_id") < 8)
    val tau = 0.995
    def asPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (exact, bruteSec) = time {
      asPairs(Similarity.rangeSearch(vecs, queries, "vec_id", "embedding", tau))
    }
    val (viaIvf, ivfSec) = time {
      asPairs(Similarity.rangeSearchIvf(vecs, queries, "vec_id", "embedding", tau, nClusters = nAnchors))
    }
    info(f"range search 100k x 8 queries: brute $bruteSec%.1fs, ivf $ivfSec%.1fs, |result|=${exact.size}")
    assert(exact.nonEmpty, "tau gate empty — fixture stopped exercising the search")
    assert(viaIvf == exact,
      s"IVF prune dropped/added matches: missing=${exact.diff(viaIvf).take(5)} extra=${viaIvf.diff(exact).take(5)}")
    // the prune is the point: probed (query, cell) pairs must be a
    // small fraction of the unpruned |Q| x nClusters fan-out — this is
    // probed-cell IO, not corpus IO
    val probed = Similarity.rangeProbePairs(vecs, queries, "vec_id", "embedding", tau, nAnchors).count()
    val unpruned = 8L * nAnchors
    info(s"probed pairs: $probed / $unpruned")
    assert(probed <= unpruned / 4, s"prune did no work: $probed of $unpruned (cells not tight?)")
    vecs.unpersist()
  }

  test("IVF append at 100k vectors: late batch searchable, fit paid once", Slow) {
    val (_, vecsPath) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 1000, nVecs = 100000, dim = 32)
    val vecs = spark.read.parquet(vecsPath)
    val (initial, late) = (vecs.filter(col("vec_id") < 99000), vecs.filter(col("vec_id") >= 99000))
    val indexDir = s"$corpusDir/ivf_append_99k_256"
    val (_, fitSec) = time {
      Similarity.buildIvfIndex(spark, initial, "vec_id", "embedding", nClusters = 256, indexDir)
    }
    val (_, appendSec) = time {
      Similarity.appendToIvfIndex(spark, late, "vec_id", "embedding", indexDir)
    }
    // probes: perturbed twins of 20 LATE vectors — findable only via
    // the appended cells
    val probes = late.filter(col("vec_id") < 99020).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x)).as("embedding"))
    val (hits, searchSec) = time {
      Similarity.ivfTopKIndexed(spark, indexDir, probes, "vec_id", "embedding", k = 1, nProbes = 64)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    }
    val found = hits.count { case (pid, nid) => nid == pid - 1000000L }
    info(f"fit+build(99k,256): $fitSec%.1fs, append(1k): $appendSec%.1fs, search: $searchSec%.1fs, twin hits: $found/${hits.size}")
    // every probe must return a result — an empty result set would
    // otherwise make the recall ratio below vacuously true
    assert(hits.size == 20, s"expected 20 probe results, got ${hits.size}")
    // append must be a small fraction of the fit+build it avoids
    assert(appendSec < 0.5 * fitSec, f"append $appendSec%.1fs vs build $fitSec%.1fs")
    assert(found >= 18, s"appended vectors not findable: $found/20")
  }

  test("IVF refit: drift appends degrade fixed-probe recall, scheduled refit restores it", Slow) {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(7)
    // 64 well-separated anchors in [0,1]^8; initial corpus = tight
    // clusters AROUND the anchors, so the fitted quantizer's Voronoi
    // boundaries fall in empty space — the healthy-index shape
    val anchors = Array.fill(64, dim)(rnd.nextFloat())
    def jitter(c: Array[Float], std: Float): Array[Float] =
      c.map(x => x + (rnd.nextFloat() - 0.5f) * 2f * std)
    val initial = (0 until 19200).map { i =>
      (i.toLong, jitter(anchors(i % 64), 0.02f).toSeq)
    }.toDF("vec_id", "embedding")
    // drift: 16 dense clusters at MIDPOINTS of anchor pairs — each one
    // straddles a frozen Voronoi boundary, so frozen-centroid appends
    // split every drift cluster ~50/50 across two cells
    val driftCenters = (0 until 16).map { j =>
      anchors(2 * j).zip(anchors(2 * j + 1)).map { case (a, b) => (a + b) / 2f }
    }
    val drift = (0 until 4800).map { i =>
      (100000L + i, jitter(driftCenters(i % 16), 0.02f).toSeq)
    }.toDF("vec_id", "embedding")

    val indexDir = s"$corpusDir/ivf_refit_24k"
    Similarity.buildIvfIndex(spark, initial, "vec_id", "embedding", nClusters = 64, indexDir)
    Similarity.appendToIvfIndex(spark, drift, "vec_id", "embedding", indexDir)

    // probes: twins of 160 drift vectors. A drift query's TRUE top-10
    // are its cluster-mates, and the frozen boundary splits those
    // ~50/50 across two cells — so recall@10 at nProbes=1 measures
    // exactly the quantizer damage (each query still returns k rows,
    // they're just the wrong neighbors)
    val probes = drift.filter(col("vec_id") < 100160L).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding"))
    val truth = Similarity.bruteForceTopK(initial.unionByName(drift), probes, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallAt10(): Double = {
      val hits = Similarity.ivfTopKIndexed(spark, indexDir, probes, "vec_id", "embedding", k = 10, nProbes = 1)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(hits.size == truth.size, s"every probe must fill k results, got ${hits.size}")
      (truth intersect hits).size.toDouble / truth.size
    }
    val frozen = recallAt10()
    val (_, refitSec) = time {
      Similarity.refitIvfIndex(spark, indexDir, nClusters = 80)
    }
    val refit = recallAt10()
    info(f"recall@10 nProbes=1: frozen $frozen%.2f -> refit $refit%.2f (refit $refitSec%.1fs)")
    // deterministic corpus (seeded): frozen measures 0.85, refit 1.00
    assert(frozen <= 0.88, s"drift should degrade fixed-probe recall, got $frozen")
    assert(refit >= 0.95, s"refit should restore recall, got $refit")
    assert(refit - frozen >= 0.10, s"refit must recover real recall: $frozen -> $refit")
    // the swap is complete and clean: no staging residue, new geometry
    // live, no vector lost
    assert(!new java.io.File(s"${indexDir}__tmp").exists(), "staging dir must be promoted away")
    assert(spark.read.parquet(s"$indexDir/centroids").count() == 80)
    assert(spark.read.parquet(s"$indexDir/cells").count() == 24000)
  }

  test("incremental minhash probe vs 100k-doc index: exact recovery, batch-scaled cost", Slow) {
    val (docsPath, _) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 100000, nVecs = 20000, dim = 32)
    val docs = spark.read.parquet(docsPath)
    // batch: 50 staged-dup partners (base stays in the corpus) + 50
    // unique docs; every expected hit is known exactly
    val isDupPartner = pmod(col("doc_id"), lit(2000L)) === 19L
    val isFresh = pmod(col("doc_id"), lit(2000L)) === 100L
    val batch = docs.filter(isDupPartner || isFresh)
    val corpus = docs.filter(!(isDupPartner || isFresh))
    val truth = (19L until 100000L by 2000L).map(id => (id, id - 1)).toSet

    // index build is the amortized, persisted side — write it out and
    // read it back so the probe measures a real cold index table
    val indexDir = s"$corpusDir/minhash_idx_100k"
    val (_, buildSec) = time {
      Dedup.buildMinhashIndex(corpus, "doc_id", "text")
        .write.mode("overwrite").parquet(indexDir)
    }
    val idx = spark.read.parquet(indexDir)
    def probeOnce() = time {
      Dedup.nearDupsAgainstIndex(batch, "doc_id", "text", idx)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val (probed, p1) = probeOnce()
    val probeSec = math.min(p1, probeOnce()._2)
    // the non-incremental alternative: re-run pair generation over the
    // whole corpus+batch union (what C3 does every time)
    val (_, fullSec) = time {
      Dedup.minhashLshPairs(docs, "doc_id", "text", tauPct = 80).write
        .format("noop").mode("overwrite").save()
    }
    info(f"index build: $buildSec%.1fs (amortized), probe of 100-doc batch: $probeSec%.1fs, full recompute: $fullSec%.1fs")
    assert(probed == truth,
      s"probe missed ${(truth -- probed).size}, extra ${(probed -- truth).size}")
    // the incremental claim: probing a small batch must cost well
    // under a full-corpus recompute (in production the gap widens —
    // the index is already on disk and the corpus is 1000x larger).
    // 0.65 margin: at this corpus size fixed per-query overhead
    // dominates the probe (~0.3x measured), so the bound holds with
    // ~2x headroom without being load-flaky; the exact-recovery
    // assertion above is the correctness gate
    assert(probeSec < 0.65 * fullSec,
      f"probe not batch-scaled: $probeSec%.1fs vs full recompute $fullSec%.1fs")
  }

  test("bloom probe vs 100k-doc index: identical answer, candidate set near the dup set", Slow) {
    val (docsPath, _) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 100000, nVecs = 20000, dim = 32)
    val docs = spark.read.parquet(docsPath)
    // batch: 500 docs copied verbatim from the corpus (known dups) +
    // 500 fresh ids whose text is unique — expected candidate set is
    // exactly the 500 copies plus ~1% bloom false positives
    val isCopy = pmod(col("doc_id"), lit(200L)) === 7L
    val isFresh = pmod(col("doc_id"), lit(200L)) === 8L
    val corpus = docs.filter(!isFresh)
    val batch = corpus.filter(isCopy)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(isFresh).select(col("doc_id"), col("text")))
    val index = Dedup.buildHashIndex(corpus, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    index.count()
    val plain = Dedup.exactAgainstIndex(batch, "doc_id", "text", index)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloomed = Dedup.exactAgainstIndexBloom(batch, "doc_id", "text", index,
      expectedKeys = 100000L, fpp = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain == bloomed, "bloom path must be byte-identical to the plain index probe")
    val nDups = plain.count(_._2 == 1L)
    assert(nDups >= 490, s"staged copies should be dups, got $nDups") // dup copies may themselves collide
    // pruning factor: candidates = true dups + fp-rate slack of the batch
    val bloom = graft.functions.Bloom.build(
      index.select(xxhash64(col("h")).as("k")), "k", 100000L, 0.01)
    val cand = batch.select(graft.functions.Bloom.bloom_might_contain(
      lit(bloom), xxhash64(Dedup.contentHash(col("text")))).as("c")).filter(col("c")).count()
    val total = batch.count()
    assert(cand <= nDups + total / 20,
      s"bloom candidates $cand should be close to the $nDups true dups (batch $total)")
    index.unpersist()
  }

  test("quantized top-k at 20k vectors: staged twin found first, int8 ranking holds up", Slow) {
    import graft.operators.EmbedOps
    val (_, vecsPath) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 100000, nVecs = 20000, dim = 32)
    val vecs = spark.read.parquet(vecsPath)
    // staged dups: vec_id % 20 == 19 duplicates vec_id - 1 exactly —
    // the twin quantizes identically, its integer dot with the query
    // is the query's own self-energy, which near-uniform competitors
    // almost never reach
    val queries = vecs.filter(pmod(col("vec_id"), lit(20L)) === 19L).limit(20)
    val (got, sec) = time {
      EmbedOps.quantizedTopK(vecs, queries, "vec_id", "embedding", k = 1)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    }
    val hits = got.count { case (qid, neighbor) => neighbor == qid - 1 }
    info(f"20 queries over 20k int8 vectors in $sec%.1fs, twin@rank1 $hits/20")
    assert(hits >= 18, s"int8 ranking should put the exact twin first: $hits/20")
  }

  test("IVF-SQ8 at 20k vectors: twin recall through the persisted index, ~4x smaller on disk", Slow) {
    import graft.operators.Similarity
    val (_, vecsPath) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 100000, nVecs = 20000, dim = 32)
    val vecs = spark.read.parquet(vecsPath)
    val floatDir = s"$corpusDir/ivf_float_20k"
    val sq8Dir = s"$corpusDir/ivf_sq8_20k"
    Similarity.buildIvfIndex(spark, vecs, "vec_id", "embedding", nClusters = 64, indexDir = floatDir)
    Similarity.buildIvfIndexSq8(spark, vecs, "vec_id", "embedding", nClusters = 64, indexDir = sq8Dir)
    def dirBytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(path).getLength
    }
    val (fb, qb) = (dirBytes(s"$floatDir/cells"), dirBytes(s"$sq8Dir/cells"))
    info(f"cells on disk: float $fb%d bytes, sq8 $qb%d bytes (${fb.toDouble / qb}%.1fx)")
    assert(qb * 2 < fb, s"sq8 cells should be well under half the float cells: $qb vs $fb")
    // staged twins must surface at rank 1 through the quantized probe
    val queries = vecs.filter(pmod(col("vec_id"), lit(20L)) === 19L).limit(20)
    val got = Similarity.ivfTopKIndexedSq8(spark, sq8Dir, queries, "vec_id", "embedding",
      k = 1, nProbes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val hits = got.count { case (qid, n) => n == qid - 1 }
    info(s"twin@rank1 through SQ8 index: $hits/${got.size}")
    assert(hits >= 17, s"SQ8 probe should find the exact twin first: $hits/${got.size}")
  }

  test("PQ at 20k vectors: 8-byte codes, twin recall through ADC+refine, far smaller than SQ8", Slow) {
    import graft.operators.Similarity
    val (_, vecsPath) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 100000, nVecs = 20000, dim = 32)
    val vecs = spark.read.parquet(vecsPath)
    val pqDir = s"$corpusDir/pq_20k"
    Similarity.buildPqIndex(spark, vecs, "vec_id", "embedding", dim = 32, indexDir = pqDir,
      m = 8, kCodes = 256)
    def dirBytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(path).getLength
    }
    // compression: the codes table stores ONE Long per vector — must
    // come in far under the float IVF cells built by the SQ8 test's
    // sibling (32 floats + id + norm per row). Compare against the raw
    // vectors parquet: > 4x smaller even after parquet's own packing.
    val (raw, cb) = (dirBytes(vecsPath), dirBytes(s"$pqDir/codes"))
    info(f"raw vectors $raw%d bytes, pq codes $cb%d bytes (${raw.toDouble / cb}%.1fx)")
    assert(cb * 4 < raw, s"PQ codes should be at least 4x smaller than raw vectors: $cb vs $raw")
    // staged twins (vec_id % 20 == 19 twins vec_id-1) must surface at
    // rank 1 through the refined probe
    val queries = vecs.filter(pmod(col("vec_id"), lit(20L)) === 19L).limit(20)
    val got = Similarity.pqTopKRefined(spark, pqDir, queries, vecs, "vec_id", "embedding",
      k = 1, shortlist = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val hits = got.count { case (qid, n) => n == qid - 1 }
    info(s"twin@rank1 through PQ ADC+refine: $hits/${got.size}")
    assert(hits >= 17, s"PQ refined probe should find the exact twin first: $hits/${got.size}")
  }

  test("winnow index probe at 100k docs: staged dups recovered, batch-scaled cost", Slow) {
    import graft.operators.TextAnalysis
    val (docsPath, _) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 100000, nVecs = 20000, dim = 32)
    val docs = spark.read.parquet(docsPath)
    val truth = SyntheticCorpus.stagedPairs(100000).map { case (a, b) => (b, a) } // (batch, corpus)
    // batch = the staged dup docs; corpus = everything else. Each dup
    // shares its base's full 30-60-word body (>> w+k-1), so winnowing
    // guarantees MANY shared fingerprints; unrelated docs share a
    // 4-gram only by 500^4-space collision
    val corpus = docs.filter(pmod(col("doc_id"), lit(20L)) =!= 19L)
    val batch = docs.filter(pmod(col("doc_id"), lit(20L)) === 19L)
    val idx = TextAnalysis.buildWinnowIndex(corpus, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    idx.count() // index built once — probe time below excludes it
    val (found, sec) = time {
      TextAnalysis.winnowAgainstIndex(batch, "doc_id", "text", idx, minShared = 3L)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    }
    idx.unpersist(blocking = false)
    val pairs = found.map(_._1).toSet
    info(f"winnow probe of 5k batch docs vs 95k-doc index: $sec%.1fs, ${pairs.size} pairs")
    assert(truth.subsetOf(pairs),
      s"staged dups must be recovered: missed ${(truth -- pairs).size} of ${truth.size}")
    // staged pairs dominate: anything extra is a rare shingle-hash
    // coincidence, not a systematic false-positive source
    assert(pairs.size <= truth.size + truth.size / 100,
      s"too many non-staged pairs: ${pairs.size - truth.size}")
    // every staged pair shares a long run -> many witnessed fingerprints
    val stagedShared = found.filter(f => truth.contains(f._1)).map(_._2)
    assert(stagedShared.forall(_ >= 3L))
  }

  test("sparse cosine join at 50k docs: staged recovery via keyed posting joins", Slow) {
    // tf-idf cosine needs a WIDE vocabulary (SyntheticCorpus's 500
    // words make every term a stopword at 100k docs): 50k docs, 20
    // doc-family-unique terms each — dup pairs share all 20 terms at
    // tf 1, unrelated docs share nothing, df <= 2 everywhere
    val n = 50000L
    val docs = spark.range(n)
      .select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(20L)) === 19L, col("id") - 1).otherwise(col("id")).as("base_id"))
      .select(col("doc_id"),
        concat(
          array_join(transform(sequence(lit(0), lit(19)),
            j => concat(lit("t"), (col("base_id") * 20 + j).cast("string"))), " "),
          // dups append one unique token (tiny cosine dent, far above 0.9)
          when(col("doc_id") =!= col("base_id"),
            concat(lit(" uniq"), col("doc_id").cast("string"))).otherwise(lit(""))).as("text"))
    val truth = SyntheticCorpus.stagedPairs(n)
    val (pairs, sec) = time {
      Dedup.sparseCosineJoin(docs, "doc_id", "text", tauBp = 9000, maxDf = 1000L)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    info(f"sparse cosine over 50k docs (1M terms): $sec%.1fs, ${pairs.size} pairs (${truth.size} staged)")
    assert(pairs == truth,
      s"missed ${(truth -- pairs).size}, extra ${(pairs -- truth).size}")
  }

  test("CMS heavy hitters at 100k docs: exact vocab recovery, light tail pruned pre-shuffle", Slow) {
    import graft.operators.TextAnalysis
    val (docsPath, _) = SyntheticCorpus.ensure(spark, corpusDir, nDocs = 100000, nVecs = 20000, dim = 32)
    val docs = spark.read.parquet(docsPath)
    // the 500 vocab words each appear ~9k times; every `uniq<id>` tail
    // word appears exactly once — threshold 1000 must recover exactly
    // the vocabulary
    val hh = TextAnalysis.heavyHitters(docs, "text", minCount = 1000L)
      .collect().map(_.getString(0)).toSet
    assert(hh == (0 until SyntheticCorpus.VocabSize).map(i => s"w$i").toSet,
      s"expected exactly the ${SyntheticCorpus.VocabSize}-word vocab, got ${hh.size}")
    // pruning: the sketch filter must drop (almost all of) the uniq___
    // tail before the exact aggregation — candidate instances ~= heavy
    // instances, far below the total term stream
    val cms = graft.functions.CountMin.build(
      docs.select(explode(split(graft.operators.Dedup.normalize(col("text")), " ")).as("t"))
        .select(xxhash64(col("t")).as("k")), "k")
    val terms = docs.select(explode(split(graft.operators.Dedup.normalize(col("text")), " ")).as("t"))
    val totalTerms = terms.count()
    val candTerms = terms
      .filter(graft.functions.CountMin.cms_estimate(lit(cms), xxhash64(col("t"))) >= 1000L).count()
    val tailTerms = totalTerms - candTerms
    info(f"term stream $totalTerms%d, sketch-admitted $candTerms%d, pruned $tailTerms%d")
    // ~5k uniq singletons exist; sketch fp can admit a few, not most
    assert(tailTerms > 3000, s"light tail should be pruned pre-shuffle, only $tailTerms dropped")
  }

  test("connected components on a power-law graph: one component holds 30% of edges", Slow) {
    // Real web corpora have one giant near-dup component (boilerplate):
    // its min label becomes a HOT KEY in both distributedComponents
    // joins (edges⋈labels on dst; pointer-jump self-join on lbl). This
    // stages that shape — 60k-edge star component (30% of 200k edges)
    // among 70k 2-node components — forces the distributed path AND
    // the SMJ form (no broadcast: at 100 TB the labels frame is
    // corpus-sized), lowers AQE's skew thresholds so the local scale
    // is visible to the optimizer, and checks (a) labels are exactly
    // right, (b) the adaptive runtime actually split a skewed join,
    // (c) wall-clock stays comparable to a uniform graph of identical
    // edge count.
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // a realistic partition count: with the suite's tiny default the
      // median partition is a quarter of the graph and no key can ever
      // exceed 2x median — exactly backwards from a 1000-executor
      // cluster where partitions are small and a hot key towers over
      // the median
      conf.set("spark.sql.shuffle.partitions", "64")
      spark.listenerManager.register(listener)

      val hub = 1L // giant star: (1, i) for i in [2, 60001] — min label 1
      val giant = spark.range(2, 60002).select(lit(hub).as("id_a"), col("id").as("id_b"))
      val small = spark.range(0, 70000) // 70k disjoint 2-node components
        .select((col("id") * 2 + 1000000L).as("id_a"), (col("id") * 2 + 1000001L).as("id_b"))
      val skewedPairs = giant.union(small)
      val uniform = spark.range(0, 100000)
        .select((col("id") * 2 + 5000000L).as("id_a"), (col("id") * 2 + 5000001L).as("id_b"))

      val (skewedLabels, skewedSec) = time {
        Dedup.connectedComponents(skewedPairs, driverMaxEdges = 0L).collect()
      }
      val (_, uniformSec) = time {
        Dedup.connectedComponents(uniform, driverMaxEdges = 0L).collect()
      }
      // (a) exactness: every star node labels to the hub; pairs to their even node
      val lbl = skewedLabels.map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lbl.size == 60001 + 140000)
      assert((2L to 60001L).forall(lbl(_) == hub), "giant component must label to its min")
      assert(lbl(hub) == hub)
      assert((0 until 70000).forall { i =>
        lbl(i * 2 + 1000000L) == i * 2 + 1000000L && lbl(i * 2 + 1000001L) == i * 2 + 1000000L
      })
      // (b) the adaptive runtime split at least one skewed join
      import scala.jdk.CollectionConverters._
      assert(plans.asScala.exists(_.contains("skew=true")),
        s"expected AQE to mark a skewed join; captured ${plans.size} plans")
      // (c) no quadratic/straggler blowup vs the uniform twin (same edge count)
      info(f"power-law $skewedSec%.2f s vs uniform $uniformSec%.2f s (200k edges)")
      assert(skewedSec <= uniformSec * 4 + 10,
        f"skewed graph took $skewedSec%.1f s vs uniform $uniformSec%.1f s — hot-label straggler?")
    } finally {
      spark.listenerManager.unregister(listener)
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }

  test("connected components at 2.3M edges: size-adaptive strategy picks the distributed loop itself; exact staged components within O(log diameter) rounds", Slow) {
    // The giant-component test above FORCES the distributed path with
    // driverMaxEdges = 0; this one crosses the DEFAULT 1M-edge
    // threshold (2.3M symmetric edges), so the size-adaptive strategy
    // itself must choose the label-propagation loop. 1000 staged
    // components of 600 nodes each: a 100-node chain hanging off the
    // hub (true diameter ~100 — pointer jumping must earn its keep; a
    // 1-hop-only propagation would need ~100 rounds), a 500-node star,
    // and 600 modular density edges for power-law-ish degrees.
    // maxIters = 12 IS the round assertion: convergence within 12
    // rounds ≈ log2(diameter) + slack, and connectedComponents throws
    // if the label sum is still falling at the cap.
    val comps = 1000L
    val size = 600L
    val ids = spark.range(0, comps * size)
    val base = expr(s"(id div $size) * $size")
    val k = col("id") % size
    val chain = ids.filter(k < 99).select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    val star = ids.filter(k >= 100).select(base.as("id_a"), col("id").as("id_b"))
    val extra = ids.select(col("id").as("id_a"), (base + 100L + (k * 7L) % 500L).as("id_b"))
    val pairs = chain.union(star).union(extra)
    val (labels, sec) = time {
      val l = Dedup.connectedComponents(pairs, maxIters = 12).persist()
      l.count()
      l
    }
    assert(labels.count() == comps * size)
    // exactness: every node labels to its component hub (the min id)
    val wrong = labels.filter(col("cluster_id") =!= expr(s"(id div $size) * $size")).count()
    assert(wrong == 0L, s"$wrong of ${comps * size} nodes mislabeled")
    info(f"distributed components over 2.3M symmetric edges in $sec%.1f s, converged <= 12 rounds (diameter ~100)")
    labels.unpersist()
  }

  test("pagerank on a mega-hub graph at 200k nodes: hot dst key absorbed by partial agg", Slow) {
    import spark.implicits._
    import graft.operators.GraphOps
    // web reality: one hub page every node links to. The dst-keyed agg
    // gets a key holding 50% of ALL contributions — survivable only
    // because map-side combine collapses each partition's hub rows to
    // one partial before the shuffle (the same property that makes
    // any hot-key count safe). Every node also links to its ring
    // successor so nothing dangles and mass stays conserved.
    val n = 200000
    val hubEdges = spark.range(n).selectExpr("id AS src", "0L AS dst")
      .union(spark.range(n).selectExpr("id AS src", s"(id + 1) % ${n}L AS dst"))
    val ring = spark.range(n).selectExpr("id AS src", s"(id + 1) % ${n}L AS dst")
      .union(spark.range(n).selectExpr("id AS src", s"(id + 7) % ${n}L AS dst"))
    // ring first: the first pageRank run pays codegen/shuffle warmup
    // for both (measured ~40 s of JIT on a cold suite JVM)
    val (_, ringSec) = time {
      GraphOps.pageRank(ring, iters = 5).collect()
    }
    val (hubRanks, hubSec) = time {
      GraphOps.pageRank(hubEdges, iters = 5).collect()
    }
    assert(hubRanks.length == n)
    val byId = hubRanks.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hub = byId(0L)
    val others = hubRanks.filter(_.getLong(0) != 0L).map(_.getLong(1)).sorted
    // node 1 legitimately rides the hub's outflow; the TYPICAL node
    // (median) must sit orders of magnitude below the hub
    assert(hub > others(others.length / 2) * 1000,
      s"hub must dominate the typical node: $hub vs median ${others(others.length / 2)}")
    assert(hub > others.last, s"hub must still be the max: $hub vs ${others.last}")
    val total = hubRanks.map(_.getLong(1)).sum
    assert(math.abs(total - 1000000000000L) < 500L * n, s"mass drifted: $total")
    info(f"mega-hub $hubSec%.2f s vs uniform ring $ringSec%.2f s (400k edges, 5 rounds)")
    assert(hubSec <= ringSec * 4 + 10,
      f"hub graph took $hubSec%.1f s vs ring $ringSec%.1f s — hot-dst straggler?")
  }

  test("integer k-means at 100k x 32: planted partition recovered exactly, one scan per round", Slow) {
    import graft.operators.EmbedOps
    val n = 100000
    val vecs = spark.range(n).selectExpr(
      "id AS vec_id",
      """transform(sequence(0, 31), d -> cast(
        |  (case when d = id % 8 then 1.0 else 0.0 end)
        |  + (((id * 31 + d * 17) % 11) - 5) / 100.0 as float)) AS embedding""".stripMargin)
    val (out, sec) = time {
      EmbedOps.kmeansFit(vecs, "vec_id", "embedding", dims = 32, k = 8, iters = 5).collect()
    }
    assert(out.length == n)
    // planted group -> fitted cluster must be a bijection on 8 groups
    val mapping = out.groupBy(_.getLong(0) % 8).map { case (g, rs) =>
      val cs = rs.map(_.getLong(1)).distinct
      assert(cs.length == 1, s"planted group $g split across $cs")
      g -> cs.head
    }
    assert(mapping.values.toSet.size == 8, "planted groups merged")
    info(f"kmeans 100k x 32, k=8, 5 rounds: $sec%.2f s")
    assert(sec < 120, f"kmeans took $sec%.1f s at 100k — scan-per-round shape broken?")
  }

  test("triangles on a mega-hub graph at 100k nodes: degree ordering defuses the deg^2 wedge bomb", Slow) {
    import spark.implicits._
    import graft.operators.GraphOps
    // one hub connected to ALL nodes, plus a sparse ring. A naive
    // src-grouped wedge enumeration emits deg(hub)^2/2 = 5e9 wedge
    // candidates from the hub alone; degree ordering directs every
    // hub edge TOWARD the hub (highest rank), so the hub emits zero
    // forward wedges and the join stays O(m^1.5) in candidates.
    val n = 100000
    val hub = spark.range(1, n).selectExpr("id AS src", "0L AS dst")
      .union(spark.range(n).selectExpr("id AS src", s"(id + 1) % ${n}L AS dst"))
    // sparse baseline with the same edge count, no hub
    val ring = spark.range(n).selectExpr("id AS src", s"(id + 1) % ${n}L AS dst")
      .union(spark.range(n).selectExpr("id AS src", s"(id + 3) % ${n}L AS dst"))
    val (ringTris, ringSec) = time { GraphOps.trianglesPerNode(ring).collect() }
    val (hubTris, hubSec) = time { GraphOps.trianglesPerNode(hub).collect() }
    // ground truth, hub graph: triangle (hub, i, i+1) for every ring
    // edge with both ends != hub — n-2 of them (the two ring edges
    // touching node 0 coincide with hub edges and close nothing new);
    // interior ring nodes sit in exactly 2, the ring neighbors of the
    // hub (1 and n-1) in exactly 1
    val byId = hubTris.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(0L) == (n - 2).toLong, s"hub must close every interior ring edge: ${byId(0L)} vs ${n - 2}")
    assert(byId(17L) == 2L && byId(1L) == 1L && byId((n - 1).toLong) == 1L,
      s"ring-node counts wrong: ${byId(17L)}, ${byId(1L)}, ${byId((n - 1).toLong)}")
    // ground truth, ring: (i, i+1, i+2)? i->i+1->i+2 needs edge (i, i+2): absent
    // (steps are +1/+3), so the +3 chord closes (i, i+1, i+2, i+3)? no 3-cycle:
    // {i, i+1} {i+1, i+2}? — only +1/+3 edges: triangle needs (i, i+3) with
    // (i, i+1)(i+1, i+3)? +2 gap absent. (i, i+3)(i+3, i+4)(i, i+4)? +4 absent.
    // => the +1/+3 circulant on even n is triangle-free... except via
    // wraparound coincidences none exist at n=100000. Brute-spot-check:
    assert(ringTris.map(_.getLong(1)).sum == 0L, "the +1/+3 circulant must be triangle-free")
    info(f"mega-hub $hubSec%.2f s vs circulant $ringSec%.2f s (~200k edges each)")
    assert(hubSec <= ringSec * 4 + 10,
      f"hub graph took $hubSec%.1f s vs ring $ringSec%.1f s — wedge explosion at the hub?")
  }
}
