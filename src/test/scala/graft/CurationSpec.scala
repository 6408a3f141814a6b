package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}
import graft.sources.Catalog

class CurationSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Catalog.load(spark, sf, "documents")

  test("scrubPii: emails, phones, IPs replaced; ordering protects IP digits from phone regex") {
    val rows = Seq(
      "write a.b+c@foo-bar.co.uk today",
      "call +1 (555) 867-5309 now",
      "host 192.168.0.1 responded",
      "mixed: x@y.io then 10.0.0.7 then 555-867-5309",
      "no pii here at all"
    ).toDF("t").select(Curation.scrubPii(col("t")).as("s")).as[String].collect()
    assert(rows(0) == "write <EMAIL> today")
    assert(rows(1) == "call <PHONE> now")
    assert(rows(2) == "host <IP> responded")
    assert(rows(3) == "mixed: <EMAIL> then <IP> then <PHONE>")
    assert(rows(4) == "no pii here at all")
  }

  test("stripMarkup: tags removed, whitespace collapsed, text preserved") {
    val r = Seq("""<html><body><h1 class="t">Hi</h1><p>a  b</p><br/>c</body></html>""")
      .toDF("t").select(Curation.stripMarkup(col("t")).as("s")).as[String].collect()(0)
    assert(r == "Hi a b c")
  }

  test("hashSplit: deterministic, complete, near the requested fractions") {
    val split1 = Curation.hashSplit(docs, "doc_id").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val split2 = Curation.hashSplit(docs.repartition(7), "doc_id").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // identical assignment regardless of partitioning/evaluation
    assert(split1 == split2)
    val n = split1.size.toDouble
    val frac = split1.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.90) < 0.05, s"train fraction off: $frac")
    assert(frac.values.sum == 1.0)
  }

  test("hashSplit edge cases: 100% train, zero val, invalid sums rejected") {
    val all = Curation.hashSplit(docs, "doc_id", trainPct = 100, valPct = 0)
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(all == Set("train"))
    val noVal = Curation.hashSplit(docs, "doc_id", trainPct = 90, valPct = 0)
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(noVal == Set("train", "test"))
    intercept[IllegalArgumentException](Curation.hashSplit(docs, "doc_id", trainPct = 90, valPct = 20))
  }

  test("contaminationHits: verbatim benchmark overlap flagged, disjoint docs clean") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "entirely different words compose this unrelated document body"),
      (12L, "the quick brown fox appears here too with extras")
    ).toDF("doc_id", "text")
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val hits = Curation.contaminationHits(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(10L) && hits.contains(12L) && !hits.contains(11L))
    // doc 10 contains all 7 benchmark trigrams; doc 12 shares 2
    assert(hits(10L) == 7L && hits(12L) == 2L)
  }

  test("packSequences: concat-then-chunk pack assignment per shard") {
    val df = (0L to 5L).map(i => (i, "x")).toDF("doc_id", "text")
    val packs = Curation.packSequences(df, "doc_id", lit(100L), budget = 250L, shards = 1)
      .select("doc_id", "pack_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // prev-cumsum: 0,100,200,300,400,500 -> packs 0,0,0,1,1,2
    assert(packs == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
    // sharding: a doc's pack depends only on its shard's prefix
    val sharded = Curation.packSequences(df, "doc_id", lit(100L), budget = 250L, shards = 2)
      .select("shard", "doc_id", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // shard 0: ids 0,2,4 -> prev 0,100,200 -> packs 0,0,0
    assert(sharded((0L, 0L)) == 0L && sharded((0L, 2L)) == 0L && sharded((0L, 4L)) == 0L)
    // shard 1: ids 1,3,5 -> prev 0,100,200 -> packs 0,0,0
    assert(sharded((1L, 5L)) == 0L)
  }

  test("decontam plan: benchmark side broadcasts (no full-corpus shuffle for the eval set)") {
    val plan = Curation.contaminationHits(
      docs.filter(col("doc_id") >= 5), docs.filter(col("doc_id") < 5), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan.take(2000))
  }
}
