package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Analytics, Incremental}

/** Continuous incremental sync — the reference's poll-loop
  * (`run_incremental(continuous=True)`, es_to_bytehouse.py:1053-1102)
  * re-expressed as Structured Streaming: the source is a stream, the
  * watermark replaces the `last_sync_time` bookkeeping, state lives in
  * the state store instead of a `_sync_state` table, and the upsert
  * into the target happens transactionally per micro-batch.
  */
object IncrementalSync {

  /** One event row (the stream's record type). */
  case class Event(
      event_id: Long,
      ts: Timestamp,
      user_id: Long,
      event_type: String,
      value: Double,
      props: String
  )

  /** Latest state per key, maintained incrementally. */
  case class KeyLatest(user_id: Long, event_id: Long, ts: Timestamp, event_type: String)

  /** File-based event stream (new parquet files appear → new
    * micro-batch). `maxFilesPerTrigger` bounds batch size, the
    * streaming analogue of the reference's SCROLL_SIZE.
    */
  def readEventStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
      )
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Windowed rollup with late-data tolerance: the streaming form of
    * Analytics.eventsHourly. Append mode emits a window only once its
    * watermark passes — exactly-once per bucket.
    */
  def hourlyCounts(events: DataFrame, lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(Analytics.cents(col("value"))).as("sum_value_c"))

  /** Sliding-window rate monitor: overlapping windows (each event
    * lands in length/slide buckets) — the smoothed-rate view behind
    * spike alerting, completing the window triad (tumbling
    * [[hourlyCounts]], session [[sessionCounts]], sliding here).
    * Identical expression works on a batch frame.
    */
  def slidingCounts(
      events: DataFrame,
      length: String = "1 hour",
      slide: String = "15 minutes",
      lateness: String = "30 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), length, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Gap-based session rollup with Spark's native session_window —
    * works identically over a stream (with watermark) or a batch
    * frame; semantics match Analytics.sessionize (same 30-min gap
    * rule, verified in tests).
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))

  /** Streaming UNIQUE-KEY upsert: per-key latest row maintained with
    * explicit state (flatMapGroupsWithState) — emits a row whenever a
    * key's latest version changes. The streaming form of
    * Incremental.latestPerKey.
    */
  def latestPerKeyStream(spark: SparkSession, events: DataFrame): Dataset[KeyLatest] = {
    import spark.implicits._
    events
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[KeyLatest]) => {
          def keyOf(ts: Timestamp, id: Long): (Long, Long) = (ts.getTime, id)
          val ord = Ordering.Tuple2[Long, Long]
          val newest = rows.reduceOption { (a, b) =>
            if (ord.gteq(keyOf(a.ts, a.event_id), keyOf(b.ts, b.event_id))) a else b
          }
          newest match {
            case Some(e) =>
              val better = state.getOption.forall(s =>
                ord.gt(keyOf(e.ts, e.event_id), keyOf(s.ts, s.event_id))
              )
              if (better) {
                val latest = KeyLatest(userId, e.event_id, e.ts, e.event_type)
                state.update(latest)
                Iterator.single(latest)
              } else Iterator.empty
            case None => Iterator.empty
          }
        }
      )
  }

  /** Streaming exact dedup: drop content-duplicate documents as they
    * arrive — the streaming form of Dedup.exact for a continuously
    * ingested corpus. State is keyed on the 128-bit content hash (the
    * document body never enters the state store) and expires once the
    * event-time watermark passes `lateness`, so state size is bounded
    * by the dedup horizon instead of growing forever — the property
    * that lets this run for months on a 100 TB/day feed.
    */
  def dedupExactStream(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      lateness: String = "1 hour"
  ): DataFrame =
    docs
      .withColumn("__h", graft.operators.Dedup.contentHash(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  /** Streaming form of Dedup.exactAgainstIndex: as documents arrive,
    * flag the ones the PERSISTED corpus hash index has already seen —
    * continuous ingest never re-reads corpus text, only the 16-byte
    * hash table. A stream-static left join on the content hash; the
    * static side's FILE LISTING is captured when the query starts, so
    * the index must not be rewritten in place while the query runs —
    * an in-place promote deletes files the stream will try to re-read
    * and kills it with FileNotFoundException. Fold processed batches
    * in by writing `Dedup.updateHashIndex` output to a NEW versioned
    * dir (`index_v{n+1}`) and restarting the query against it. Docs
    * that duplicate each other WITHIN the stream's run are
    * [[dedupExactStream]]'s job, and the two compose by chaining.
    * Output: input rows + (is_dup, dup_of).
    */
  def dedupAgainstIndexStream(docs: DataFrame, textCol: String, index: DataFrame): DataFrame = {
    graft.operators.Dedup.requireBinaryHashIndex(index)
    docs
      .withColumn("__h", graft.operators.Dedup.contentHash(col(textCol)))
      .join(index.select(col("h").as("__h"), col("kept_id")), Seq("__h"), "left")
      .withColumn("is_dup", when(col("kept_id").isNotNull, 1L).otherwise(0L))
      .withColumnRenamed("kept_id", "dup_of")
      .drop("__h")
  }

  /** Streaming form of Dedup.nearDupsAgainstIndex (the C29 probe):
    * as documents arrive, emit (id_a = stream doc, id_b = corpus doc,
    * jacc_pct, tsCol) for every persisted-index near-dup at Jaccard ≥
    * τ — continuous-ingest NEAR-dup screening, where
    * [[dedupAgainstIndexStream]] only catches exact copies. Stream
    * docs are signed and banded per row (stateless projections); two
    * stream-static equi-joins do the work — candidates on (band,
    * band-hash) against the index's banded signatures, verification
    * on id against the index's stored shingle sets (same integer
    * exact-Jaccard as batch). A pair colliding in several bands would
    * duplicate, so matched pairs pass through
    * `dropDuplicatesWithinWatermark` keyed on the ID PAIR — per-pair
    * state is two longs, text never enters the state store, and the
    * watermark bounds state exactly like [[dedupExactStream]]. The
    * static index snapshot caveat of [[dedupAgainstIndexStream]]
    * applies: fold processed batches in via Dedup.updateMinhashIndex-
    * style versioned dirs and restart against the new version.
    */
  def nearDupAgainstIndexStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      index: DataFrame,
      k: Int = 64,
      bands: Int = 16,
      shingleN: Int = 3,
      tauPct: Int = 80,
      lateness: String = "1 hour"
  ): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    import graft.operators.Dedup
    // signature inline (withSignature drops extra columns; the
    // watermark needs tsCol alongside) — same hs/sig identities, so
    // band hashes stay join-compatible with the persisted index
    val sigs = docs.select(col(idCol).as("id"), col(tsCol),
        array_sort(array_distinct(Dedup.shingleHashSet(col(textCol), shingleN))).as("hs"))
      .withColumn("sig", graft.functions.VecOps.minhash_sig(col("hs"), k))
    // (id, hs, sig, ts): band-explode for candidates, then fetch ONLY
    // matching corpus rows' hash sets by id
    val banded = sigs.select(col("id"), col("hs"), col(tsCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        bi => xxhash64(slice(col("sig"), bi * r + 1, lit(r))))).as(Seq("band", "bh")))
    val idxBands = Dedup.bandedSignatures(index, bands, r)
      .select(col("band"), col("bh"), col("id").as("id_b"))
    val idxSets = index.select(col("id").as("id_b"), col("hs").as("hs_b"))
    banded
      .join(idxBands, Seq("band", "bh"))
      .select(col("id").as("id_a"), col("hs").as("hs_a"), col(tsCol), col("id_b"))
      .join(idxSets, Seq("id_b"))
      .withColumn("i", graft.functions.VecOps.sorted_intersect_count(col("hs_a"), col("hs_b")))
      .withColumn("u", (size(col("hs_a")) + size(col("hs_b"))).cast("long") - col("i"))
      .filter(col("i") * 100 >= col("u") * tauPct)
      .select(col("id_a"), col("id_b"),
        floor(col("i") * lit(100.0) / col("u")).as("jacc_pct"), col(tsCol))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("id_a", "id_b")
  }

  /** C21d: streaming perceptual-hash probe — the VISUAL signal for
    * continuous ingest, closing the index-probe family (exact C21b,
    * MinHash C21c, containment C21e): as image rows arrive, decode +
    * aHash each (one per-row JVM pass — [[graft.operators.Multimodal
    * .aHashOf]], the window/agg chain of the batch hasher is illegal
    * on streams; hash equality is spec-pinned against the batch
    * probe) and left-join the persisted phash index. Fully STATELESS:
    * no watermark, no state store — the join is stream-static on the
    * 16-char hash, output (id, ts, is_dup, dup_of) per arriving
    * image, the [[dedupAgainstIndexStream]] contract on pixels.
    * Same static-snapshot caveat as every C21 probe: fold processed
    * batches in via Multimodal.updatePhashIndex and restart.
    */
  def phashAgainstIndexStream(
      docs: DataFrame,
      idCol: String,
      binCol: String,
      tsCol: String,
      index: DataFrame
  ): DataFrame = {
    graft.operators.Multimodal.requirePhashIndex(index)
    import docs.sparkSession.implicits._
    val hashed = docs
      .select(col(idCol).cast("long"), col(tsCol).cast("timestamp"), col(binCol))
      .as[(Long, Timestamp, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, ts, bytes) =>
        graft.operators.Multimodal.aHashOf(bytes).map(ph => (id, ts, ph))
      })
      .toDF(idCol, tsCol, "phash")
    hashed
      .join(index, Seq("phash"), "left")
      .select(col(idCol), col(tsCol),
        when(col("kept_id").isNotNull, 1L).otherwise(0L).as("is_dup"),
        col("kept_id").as("dup_of"))
  }

  /** C21e: streaming containment probe — the overlap/quotation signal
    * for continuous ingest, against a persisted
    * [[graft.operators.Dedup.buildContainmentIndex]] frame. The batch
    * probe's prefix/positional/KMV machinery exists to avoid fetching
    * full arrays for losing pairs; a stream can't re-join itself to
    * fetch its own arrays back, so the streaming form computes the
    * intersection WITHOUT arrays: explode the batch doc's shingle
    * hashes (8 bytes each ride the exchange), equi-join the index's
    * posting list, and COUNT matching hashes per (id_a, id_b) — both
    * sides are distinct sets, so count(shared h) IS |∩| exactly, and
    * cont = |∩| DIV min(|a|,|b|) reproduces the batch semantics
    * (≥ τ·smaller, no size-ratio filter) pair for pair (spec-pinned).
    * The candidate prune happens structurally: only co-occurring
    * hashes join. State: one counter per candidate pair inside the
    * watermark (the aggregation), two longs + counts — text and
    * arrays never enter the state store. Batch/corpus id spaces must
    * be disjoint (the [[nearDupAgainstIndexStream]] contract).
    */
  def containmentAgainstIndexStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      index: DataFrame,
      n: Int = 3,
      tauPct: Int = 80,
      lateness: String = "1 hour"
  ): DataFrame = {
    import graft.operators.Dedup
    val postings = docs
      .select(col(idCol).cast("long").as("id_a"), col(tsCol),
        array_sort(array_distinct(Dedup.shingleHashSet(col(textCol), n))).as("hs"))
      .withColumn("na", size(col("hs")).cast("long"))
      .select(col("id_a"), col(tsCol), col("na"), explode(col("hs")).as("h"))
      .withWatermark(tsCol, lateness)
    val idxPostings = index
      .select(col("id").as("id_b"), col("nsh").as("nb"), explode(col("hs")).as("h"))
    postings
      .join(idxPostings, Seq("h"))
      .groupBy(col(tsCol), col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("i"))
      .filter(col("i") * 100 >= least(col("na"), col("nb")) * tauPct)
      .select(col("id_a"), col("id_b"),
        floor(col("i") * lit(100.0) / least(col("na"), col("nb"))).as("cont_pct"),
        col(tsCol))
  }

  /** C21f: streaming winnow probe — the copied-MATERIAL signal for
    * continuous ingest, closing the last index-family member without a
    * streaming form (exact C21b, MinHash C21c, phash C21d, containment
    * C21e). Each arriving doc winnows to its distinct fingerprint
    * hashes in ONE per-row projection (`winnow_fps` is a codegen
    * kernel — no window functions, which are illegal on streams),
    * explodes them (8-byte hashes ride the exchange, never text), and
    * equi-joins the persisted [[graft.operators.TextAnalysis
    * .buildWinnowIndex]] posting list — the C21e posting-join
    * discipline: candidates arise structurally from co-occurring
    * hashes, state is one counter per candidate pair inside the
    * watermark. Both sides are distinct per doc, so count(shared) is
    * exactly the batch probe's n_shared — spec-pinned drained ≡ batch.
    * Batch/corpus id spaces must be disjoint (self-pairs dropped
    * defensively, the [[nearDupAgainstIndexStream]] contract); fold
    * processed batches in via TextAnalysis.updateWinnowIndex and
    * restart for index growth.
    */
  def winnowAgainstIndexStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      index: DataFrame,
      k: Int = 4,
      w: Int = 4,
      minShared: Long = 2L,
      lateness: String = "1 hour"
  ): DataFrame = {
    val fps = docs
      .select(col(idCol).cast("long").as("id_a"), col(tsCol),
        explode(array_distinct(transform(
          graft.functions.VecOps.winnow_fps(
            split(graft.operators.Dedup.normalize(col(textCol)), " "), k, w),
          f => f.getField("fp_hash")))).as("fp_hash"))
      .withWatermark(tsCol, lateness)
    val idxFps = index.select(col(idCol).as("id_b"), col("fp_hash")).distinct()
    fps
      .join(idxFps, Seq("fp_hash"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col(tsCol), col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("id_a"), col("id_b"), col("n_shared"), col(tsCol))
  }

  /** foreachBatch upsert into an UNPARTITIONED parquet target: merge
    * the micro-batch with the existing target by key (latest version
    * wins) and swap with checked renames (a failed swap restores the
    * previous target and throws, so the streaming query retries the
    * batch instead of losing the target). Suitable for small targets;
    * the scale path is [[upsertBatchPartitioned]].
    */
  def upsertBatch(
      spark: SparkSession,
      target: String,
      keyCols: Seq[String],
      orderCols: Seq[String]
  )(batch: DataFrame, batchId: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(new org.apache.hadoop.fs.Path(target))) {
        Incremental.mergeUpsert(spark.read.parquet(target), batch, keyCols, orderCols)
      } else batch
    val tmp = s"${target}__tmp_$batchId"
    merged.write.mode("overwrite").parquet(tmp)
    graft.sinks.PartitionedUpsert.promote(fs, tmp, target)
  }

  /** A35's streaming twin: foreachBatch CDC apply — each micro-batch
    * of I/U/D changes merges into the parquet snapshot via
    * [[Incremental.cdcApply]] (latest seq wins, deletes remove),
    * with the same checked-promote swap as [[upsertBatch]].
    *
    * Ordering contract: the stream must deliver a key's changes in
    * non-decreasing seq order ACROSS micro-batches (binlog replay
    * order — what CDC sources provide); within a batch any order is
    * fine, cdcApply picks the max seq. A change that arrives after a
    * later-seq change for the same key would win here (the snapshot
    * doesn't retain per-key seqs) — out-of-order logs need the
    * seq-retaining variant, not this sink. Suitable for small
    * targets; partition the snapshot for scale like
    * [[upsertBatchPartitioned]].
    */
  def cdcBatch(
      spark: SparkSession,
      target: String,
      keyCol: String,
      seqCol: String,
      opCol: String,
      payloadCols: Seq[String]
  )(batch: DataFrame, batchId: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base =
      if (fs.exists(new org.apache.hadoop.fs.Path(target)))
        spark.read.parquet(target).drop("src")
      else batch.select(col(keyCol) +: payloadCols.map(col): _*).limit(0)
    val merged = Incremental.cdcApply(base, batch, keyCol, seqCol, opCol, payloadCols)
    val tmp = s"${target}__tmp_$batchId"
    merged.write.mode("overwrite").parquet(tmp)
    graft.sinks.PartitionedUpsert.promote(fs, tmp, target)
  }

  /** foreachBatch incremental rollup maintenance: the streaming twin
    * of `Incremental.mergeRollup`. Each micro-batch computes its OWN
    * keyed partials (`partials` is the caller's groupBy over raw batch
    * rows) and folds them into the persisted partials table by
    * union + re-agg on the same keys — history is summarized by its
    * partials and never rescanned, so the per-batch cost is
    * O(|batch| + |groups|). The target is GROUP-scale (hour × type),
    * not data-scale, which is what makes the checked-rename full swap
    * safe at any corpus size. Sound for commutative-monoid measures,
    * exactly like the batch path.
    */
  def rollupBatch(
      spark: SparkSession,
      target: String,
      keyCols: Seq[String],
      addCols: Seq[String],
      partials: DataFrame => DataFrame
  )(batch: DataFrame, batchId: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // foreachBatch is at-least-once: after a failure the engine replays
    // the last batchId, and folding its partials in a second time would
    // double-count sums/counts (the upsert siblings are key-idempotent,
    // this fold is not). The last applied batchId travels INSIDE the
    // target as an underscore-prefixed marker (ignored by parquet
    // readers), so it promotes atomically with the data it describes.
    val metaPath = new org.apache.hadoop.fs.Path(target, "_graft_last_batch")
    if (fs.exists(metaPath)) {
      val in = fs.open(metaPath)
      val last =
        try {
          val buf = new Array[Byte](64)
          val n = in.read(buf)
          new String(buf, 0, math.max(n, 0), "UTF-8").trim.toLong
        } finally in.close()
      if (batchId <= last) return
    }
    val bp = partials(batch)
    val merged =
      if (fs.exists(new org.apache.hadoop.fs.Path(target)))
        Incremental.mergeRollup(spark.read.parquet(target), bp, keyCols, addCols)
      else bp
    val tmp = s"${target}__tmp_$batchId"
    merged.write.mode("overwrite").parquet(tmp)
    val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_graft_last_batch"), true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    graft.sinks.PartitionedUpsert.promote(fs, tmp, target)
  }

  /** foreachBatch upsert into a PARTITIONED parquet target: per
    * micro-batch, only the partitions present in the batch are read,
    * merged, and rewritten (dynamic partition overwrite) — IO per
    * batch stays proportional to the batch's partition footprint, not
    * the target size. This is the 100 TB deployment shape of the
    * reference's continuous incremental sync.
    */
  def upsertBatchPartitioned(
      spark: SparkSession,
      target: String,
      keyCols: Seq[String],
      orderCols: Seq[String],
      partCol: String
  )(batch: DataFrame, batchId: Long): Unit = {
    graft.sinks.PartitionedUpsert.merge(spark, batch, target, keyCols, orderCols, partCol)
    ()
  }

  /** A session in progress or closed. `closed` sessions are emitted
    * exactly once (the moment a later event proves the gap); the
    * currently-open session is re-emitted each micro-batch it grows.
    */
  case class SessionOut(
      user_id: Long,
      session_id: Long,
      n_events: Long,
      start_us: Long,
      end_us: Long,
      closed: Boolean
  )

  case class SessState(sessionId: Long, startUs: Long, lastUs: Long, nEvents: Long)

  /** A12b: custom-state sessionization via flatMapGroupsWithState —
    * what [[sessionCounts]]'s native `session_window` cannot express:
    * STABLE per-user session ids (1, 2, 3... in arrival order, so a
    * downstream join key exists while the session is still open) and
    * an exactly-once `closed` event per session the moment the gap is
    * proven. State per user is one open session (4 longs), not the
    * event list — bounded regardless of session length.
    *
    * Events are sorted within each micro-batch; ACROSS batches the
    * operator assumes per-user event-time order (an event older than
    * the open session's last timestamp folds into it rather than
    * splitting history — the deliberate tradeoff for O(1) state; feed
    * it watermark-ordered input when late data matters, e.g. from a
    * sorted file stream).
    */
  def sessionizeStateful(
      spark: SparkSession,
      events: DataFrame,
      gapMinutes: Int = 30
  ): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessState]) => {
          // exact micros (Timestamp.getTime is ms-truncated; the
          // sub-ms part lives in getNanos — Spark timestamps are µs)
          def micros(t: Timestamp): Long =
            math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          val sorted = rows.toArray.sortBy(e => (micros(e.ts), e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var cur = state.getOption.orNull
          sorted.foreach { e =>
            val us = micros(e.ts)
            if (cur == null) {
              cur = SessState(1L, us, us, 1L)
            } else if (us - cur.lastUs > gapUs) {
              out += SessionOut(userId, cur.sessionId, cur.nEvents, cur.startUs, cur.lastUs, closed = true)
              cur = SessState(cur.sessionId + 1L, us, us, 1L)
            } else {
              cur = cur.copy(
                lastUs = math.max(cur.lastUs, us),
                startUs = math.min(cur.startUs, us),
                nEvents = cur.nEvents + 1L
              )
            }
          }
          if (cur != null) {
            state.update(cur)
            out += SessionOut(userId, cur.sessionId, cur.nEvents, cur.startUs, cur.lastUs, closed = false)
          }
          out.iterator
        }
      )
  }

  /** Live per-user windowed-funnel progress. */
  case class FunnelOut(user_id: Long, level: Long)

  /** Windowed-funnel fold state: 3 longs per user, O(1) forever. */
  case class FunnelState(lvl: Long, anchorUs: Long, lastUs: Long)

  /** A12c: STREAMING windowed funnel — the continuous form of B83
    * ([[graft.operators.Analytics.funnelWindowLevels]]): each user's
    * stage depth advances live as events arrive, so a campaign
    * dashboard reads conversion depth DURING the campaign instead of
    * re-running the batch funnel per refresh. The state machine is
    * exactly the batch default-mode kernel (advance iff the event is
    * the expected next stage, strictly after the last match, inside
    * the window anchored at the first head event) carried in 3 longs
    * per user — never the event list; emissions are per-user current
    * level (Update mode), so the latest row per user IS the funnel
    * position. Drained-stream ≡ batch level histogram is spec-proven
    * (the C21c discipline). Same cross-batch ordering contract as
    * [[sessionizeStateful]]: events are sorted within a micro-batch;
    * across batches per-user event-time order is assumed (feed
    * watermark-ordered input when late data matters).
    */
  def funnelLevelsStateful(
      spark: SparkSession,
      events: DataFrame,
      stages: Seq[String],
      windowSec: Long
  ): Dataset[FunnelOut] = {
    import spark.implicits._
    require(stages.length >= 2, "windowed funnel needs at least two stages")
    require(windowSec > 0, s"window must be positive, got $windowSec")
    val stageIdx = stages.zipWithIndex.toMap
    val windowUs = windowSec * 1000000L
    events
      .as[Event]
      .filter(e => stageIdx.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) => {
          def micros(t: Timestamp): Long =
            math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          // tie order matches the batch kernel's pack sort: (us, stage)
          val sorted = rows.toArray.sortBy(e => (micros(e.ts), stageIdx(e.event_type)))
          var st = state.getOption.getOrElse(FunnelState(0L, 0L, 0L))
          sorted.foreach { e =>
            val t = micros(e.ts)
            val s = stageIdx(e.event_type).toLong
            if (s == st.lvl && st.lvl < stages.length &&
              (st.lvl == 0L || (t > st.lastUs && t <= st.anchorUs + windowUs))) {
              st = FunnelState(st.lvl + 1L, if (st.lvl == 0L) t else st.anchorUs, t)
            }
          }
          state.update(st)
          // anchored users re-emit their (possibly unchanged) level each
          // batch they appear in — Update mode: latest row = position
          if (st.lvl > 0L) Iterator.single(FunnelOut(userId, st.lvl)) else Iterator.empty
        }
      )
  }
}
