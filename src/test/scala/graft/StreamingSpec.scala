package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming harness tests (SURVEY.md §5.2 item 5): watermark +
  * late-data semantics and stateful dedup are not DuckDB-observable, so they
  * are exercised here with MemoryStream micro-batches.
  */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streamingTumbling counts per 10-minute window and drops late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = ops.Streaming.streamingTumbling(
      mem.toDF().toDF("ts", "event_type"))
    val q = df.writeStream.format("memory").queryName("tumb")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData((ts(1), "view"), (ts(2), "view"), (ts(11), "click"))
      q.processAllAvailable()
      // advance watermark far past 10:10, then feed a too-late row
      mem.addData((ts(59), "view"))
      q.processAllAvailable()
      mem.addData((ts(5), "view")) // late beyond watermark: dropped
      q.processAllAvailable()
      val out = spark.table("tumb")
        .groupBy("win_start", "event_type").agg(max("n").as("n"))
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2))).toSet
      assert(out.contains(("2024-01-01 10:00:00.0", "view", 2L)),
        s"late row must not bump the 10:00 window: $out")
      assert(out.contains(("2024-01-01 10:10:00.0", "click", 1L)))
    } finally q.stop()
  }

  test("streamingDedup drops duplicate event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = ops.Streaming.streamingDedup(mem.toDF().toDF("event_id", "ts"))
    val q = df.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, ts(1)), (2L, ts(2)))
      q.processAllAvailable()
      mem.addData((1L, ts(3)), (3L, ts(4))) // 1 is a duplicate
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), ids.mkString(","))
    } finally q.stop()
  }

  test("streamingRunningCount keeps per-user state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val ds = ops.Streaming.streamingRunningCount(spark, mem.toDS())
    val q = ds.toDF("user_id", "n").writeStream.format("memory")
      .queryName("runcount").outputMode(OutputMode.Update()).start()
    try {
      mem.addData((7L, ts(1)), (7L, ts(2)), (8L, ts(3)))
      q.processAllAvailable()
      mem.addData((7L, ts(4)))
      q.processAllAvailable()
      val last = spark.table("runcount")
        .groupBy("user_id").agg(max("n").as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(last == Map(7L -> 3L, 8L -> 1L), last.toString)
    } finally q.stop()
  }

  test("streaming file sink: windowed counts land in parquet exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = SparkSpec.scratchDir("graft_stream")
    val mem = MemoryStream[(Timestamp, String)]
    val df = ops.Streaming.streamingTumbling(
      mem.toDF().toDF("ts", "event_type"))
    // file sinks require Append mode: a window emits once its watermark
    // passes — the exactly-once production topology (checkpoint + sink log)
    val q = df.writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts(1), "view"), (ts(2), "view"), (ts(11), "click"))
      q.processAllAvailable()
      mem.addData((ts(59), "view")) // advances watermark, finalizes windows
      q.processAllAvailable()
      val out = spark.read.parquet(s"$root/out")
        .select("win_start", "event_type", "n")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2))).toSet
      assert(out.contains(("2024-01-01 10:00:00.0", "view", 2L)), out.toString)
      assert(out.contains(("2024-01-01 10:10:00.0", "click", 1L)), out.toString)
    } finally q.stop()
  }

  test("restart from checkpoint: window state survives, no duplicate emission") {
    // the recovery contract a production stream depends on: stop the
    // query mid-window, start a NEW query from the same checkpoint, and
    // the open window must keep aggregating (state restored) while the
    // sink sees each finalized window exactly once (offsets restored)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = SparkSpec.scratchDir("graft_restart")
    val mem = MemoryStream[(Timestamp, String)]
    val df = ops.Streaming.streamingTumbling(
      mem.toDF().toDF("ts", "event_type"))
    def start() = df.writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      mem.addData((ts(1), "view"), (ts(2), "view"))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      mem.addData((ts(5), "view"))  // same 10:00 window, POST-restart
      q2.processAllAvailable()
      mem.addData((ts(59), "view")) // watermark passes, finalizes 10:00
      q2.processAllAvailable()
      val rows = spark.read.parquet(s"$root/out")
        .filter(col("event_type") === "view"
          && col("win_start") === ts(0))
        .collect()
      assert(rows.length == 1,
        s"the finalized window must emit exactly once across the " +
          s"restart: ${rows.mkString(",")}")
      assert(rows.head.getAs[Long]("n") == 3L,
        s"state must aggregate rows from BOTH runs (2 pre + 1 post): " +
          s"${rows.head}")
    } finally q2.stop()
  }

  test("streamingSliding: finalized windows match the batch form exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = ops.Streaming.streamingSliding(mem.toDF().toDF("ts", "event_type"))
    // Append mode: a window emits exactly once, when the watermark passes
    // its END — the exactly-once contract a downstream file sink needs
    val q = df.writeStream.format("memory").queryName("slide")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = Seq((ts(1), "view"), (ts(2), "view"), (ts(11), "click"))
      mem.addData(base: _*)
      q.processAllAvailable()
      mem.addData((ts(59), "view")) // watermark → 10:49, finalizes base windows
      q.processAllAvailable()
      val streamed = spark.table("slide")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
      // batch/stream parity: the same rows through the batch expressions
      val batch = base.toDF("ts", "event_type")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("n"))
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
      assert(streamed == batch,
        s"stream=$streamed batch=$batch — finalized sliding windows must " +
          "agree with the batch formulation")
      // every event lands in exactly 2 of the 5-minute-slide windows
      assert(batch.toSeq.map(_._2).sum == 2L * base.size)
    } finally q.stop()
  }

  test("streamingSession: finalized sessions match the batch form; open ones held back") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = ops.Streaming.streamingSession(mem.toDF().toDF("user_id", "ts"))
    val q = df.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = Seq(
        (1L, ts(0)), (1L, ts(10)), // one session (merged in state)
        (1L, ts(50)),              // gap 40 min → second session
        (2L, ts(5)))
      mem.addData(base: _*)
      q.processAllAvailable()
      mem.addData((3L, ts(59))) // watermark → 10:49
      q.processAllAvailable()
      val streamed = spark.table("sess")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getLong(2))).toSet
      // batch form over the same rows: sessions whose close (last event +
      // 30 min gap) precedes the 10:49 watermark must have been emitted,
      // later ones must still be open in state
      val batch = base.toDF("user_id", "ts")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("session_window.start").as("s"),
          col("session_window.end").as("e"), col("n"))
        .collect()
      val watermark = ts(49)
      val (closed, open) = batch.partition(_.getTimestamp(2).before(watermark))
      assert(closed.nonEmpty && open.nonEmpty, "fixture must exercise both")
      val closedSet = closed.map(r => (r.getLong(0),
        r.getTimestamp(1).toString, r.getLong(3))).toSet
      assert(streamed == closedSet,
        s"stream=$streamed batchClosed=$closedSet — finalized sessions " +
          "must agree with the batch session_window formulation")
      val openSet = open.map(r => (r.getLong(0),
        r.getTimestamp(1).toString, r.getLong(3))).toSet
      assert((streamed & openSet).isEmpty,
        "sessions still inside the watermark must not have been emitted")
    } finally q.stop()
  }

  test("streamingEnrichJoin: stream-static join windows match the batch form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("user_id", "c_mktsegment")
    val mem = MemoryStream[(Long, Timestamp)]
    val df = ops.Streaming.streamingEnrichJoin(
      mem.toDF().toDF("user_id", "ts"), dim)
    val q = df.writeStream.format("memory").queryName("enrich")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = Seq((1L, ts(1)), (1L, ts(2)), (2L, ts(11)),
        (9L, ts(3))) // user 9 has no dim row: inner join drops it
      mem.addData(base: _*)
      q.processAllAvailable()
      mem.addData((1L, ts(59))) // watermark → 10:49, finalizes base windows
      q.processAllAvailable()
      val streamed = spark.table("enrich")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2))).toSet
      // batch parity: the same rows through the batch join+window
      val batch = base.toDF("user_id", "ts")
        .join(broadcast(dim), Seq("user_id"))
        .groupBy(window(col("ts"), "10 minutes"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"),
          col("c_mktsegment").as("segment"), col("n"))
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2))).toSet
      assert(streamed == batch,
        s"stream=$streamed batch=$batch — finalized enriched windows must " +
          "agree with the batch join formulation")
      assert(!streamed.exists(_._2 == null), "no unmatched rows may leak")
    } finally q.stop()
  }

  test("streamingIntervalJoin: two-stream attribution pairs match the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val df = ops.Streaming.streamingIntervalJoin(
      views.toDF().toDF("user_id", "v_ts"),
      clicks.toDF().toDF("c_user", "c_ts"))
    val q = df.writeStream.format("memory").queryName("ivj")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: click 5 min after view (match), click 20 min after (no);
      // user 2: click BEFORE the view (no); user 3: view only
      views.addData((1L, ts(0)), (2L, ts(10)), (3L, ts(15)))
      clicks.addData((1L, ts(5)), (1L, ts(20)), (2L, ts(5)))
      q.processAllAvailable()
      val streamed = spark.table("ivj")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString)).toSet
      assert(streamed == Set((1L, "2024-01-01 10:00:00.0",
        "2024-01-01 10:05:00.0")), streamed.toString)
      // batch parity over the same rows
      val batch = Seq((1L, ts(0)), (2L, ts(10)), (3L, ts(15)))
        .toDF("user_id", "v_ts")
        .join(Seq((1L, ts(5)), (1L, ts(20)), (2L, ts(5)))
          .toDF("c_user", "c_ts"),
          expr("user_id = c_user AND c_ts > v_ts " +
            "AND c_ts <= v_ts + interval 10 minutes"))
        .select(col("user_id"), col("v_ts"), col("c_ts"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString)).toSet
      assert(streamed == batch,
        s"stream=$streamed batch=$batch — the two-stream interval join " +
          "must agree with the batch formulation")
    } finally q.stop()
  }

  test("streamingLeftIntervalJoin: unmatched views null-pad once the click watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val df = ops.Streaming.streamingLeftIntervalJoin(
      views.toDF().toDF("user_id", "v_ts"),
      clicks.toDF().toDF("c_user", "c_ts"))
    val q = df.writeStream.format("memory").queryName("livj")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 converts (click 5 min after view); user 3 never does
      views.addData((1L, ts(0)), (3L, ts(1)))
      clicks.addData((1L, ts(5)))
      q.processAllAvailable()
      // the matched pair may emit now; the unmatched view for user 3
      // must NOT null-pad yet — a click could still arrive
      val early = spark.table("livj").collect()
        .filter(r => r.getLong(0) == 3L)
      assert(early.isEmpty,
        s"user 3 must stay in state while its interval is open: " +
          early.mkString(","))
      // advance BOTH watermarks far past view+10min (the global
      // watermark is the min across inputs): "no click" is now a fact,
      // the outer row must emit null-padded
      views.addData((98L, ts(59)))
      clicks.addData((99L, ts(59)))
      q.processAllAvailable()
      clicks.addData((99L, ts(59))) // second batch so the new watermark applies
      q.processAllAvailable()
      val out = spark.table("livj").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          Option(r.getTimestamp(2)).map(_.toString).orNull)).toSet
      assert(out.contains((1L, "2024-01-01 10:00:00.0",
        "2024-01-01 10:05:00.0")), s"matched pair missing: $out")
      assert(out.contains((3L, "2024-01-01 10:01:00.0", null)),
        s"unmatched view must null-pad after the watermark: $out")
      // batch parity on the matched subset: the streaming result rows
      // (minus watermark-mechanics timing) = the batch left join
      val batch = Seq((1L, ts(0)), (3L, ts(1))).toDF("user_id", "v_ts")
        .join(Seq((1L, ts(5))).toDF("c_user", "c_ts"),
          expr("user_id = c_user AND c_ts > v_ts " +
            "AND c_ts <= v_ts + interval 10 minutes"), "leftOuter")
        .select(col("user_id"), col("v_ts"), col("c_ts"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          Option(r.getTimestamp(2)).map(_.toString).orNull)).toSet
      assert(out.filter(t => t._1 < 90L) == batch,
        s"stream=$out batch=$batch (watermark-advance rows excluded)")
    } finally q.stop()
  }

  test("foreachBatch CDC upsert: streamed merges equal the final keyed state") {
    // the streaming twin of sink_upsert: each micro-batch of keyed
    // changes merges into a versioned table snapshot (read current →
    // last-write-wins window → write NEXT version, never overwriting the
    // snapshot being read — the copy-on-write discipline a real lake
    // needs for snapshot isolation). After two ordered batches the
    // table must hold exactly the last write per key.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = SparkSpec.scratchDir("cdc_upsert")
    (1L to 10L).map(k => (k, 0.0)).toDF("k", "v")
      .write.parquet(s"$root/v0")
    @volatile var current = s"$root/v0"
    var version = 0
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        version += 1
        val next = s"$root/v$version"
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy(col("gen").desc)
        batch.sparkSession.read.parquet(current).withColumn("gen", lit(0))
          .unionByName(batch.withColumn("gen", lit(1)))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn", "gen")
          .write.mode("overwrite").parquet(next)
        current = next
      }.start()
    try {
      mem.addData((2L, 20.0), (11L, 110.0)) // update k=2, insert k=11
      q.processAllAvailable()
      mem.addData((2L, 21.0), (3L, 30.0))   // k=2 again: later batch wins
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(current).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val want = (1L to 10L).map(k => k -> 0.0).toMap ++
      Map(2L -> 21.0, 3L -> 30.0, 11L -> 110.0)
    assert(got == want, s"merged state diverged: $got")
    assert(version == 2, s"expected one snapshot per micro-batch: $version")
  }

  test("streaming Misra-Gries: bounded per-shard state equals the replayed fold, heavies survive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cap = 3
    val shards = 4
    // churn-heavy stream across two micro-batches: two heavy tokens
    // drowned in one-off noise, the shape that evicts naive top-k state
    val b1 = Seq.tabulate(60)(i => s"noise$i") ++ Seq.fill(30)("heavy1")
    val b2 = Seq.fill(25)("heavy2") ++ Seq.tabulate(40)(i => s"late$i") ++
      Seq.fill(15)("heavy1")
    val seq1 = b1.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val seq2 = b2.zipWithIndex.map { case (t, i) => (1000L + i, t) }
    val mem = MemoryStream[(Long, String)]
    val finalState =
      scala.collection.mutable.Map.empty[Int, Map[String, Long]]
    val q = ops.Streaming
      .streamingHeavyHitters(spark, mem.toDS(), cap, shards)
      .writeStream.outputMode("update")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[(Int, Map[String, Long])],
         _: Long) =>
          batch.collect().foreach { case (sh, m) => finalState(sh) = m }
      }.start()
    try {
      mem.addData(seq1: _*)
      q.processAllAvailable()
      mem.addData(seq2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // exact replay law: two checkpointed micro-batch folds ARE the one
    // fold over the concatenation, per shard
    val all = seq1 ++ seq2
    val expected = all.groupBy(p => math.floorMod(p._2.hashCode, shards))
      .map { case (sh, rows) =>
        sh -> rows.sortBy(_._1).map(_._2)
          .foldLeft(Map.empty[String, Long])(ops.Streaming.mgStep(cap))
      }
    expected.foreach { case (sh, want) =>
      assert(finalState.getOrElse(sh, Map.empty) == want,
        s"shard $sh state diverged from the replayed fold")
    }
    // retention corollary from TRUE per-shard counts: every token over
    // the N/(cap+1) guarantee line must still be tracked
    all.groupBy(p => math.floorMod(p._2.hashCode, shards))
      .foreach { case (sh, rows) =>
        val n = rows.size
        rows.groupBy(_._2).view.mapValues(_.size)
          .filter(_._2 > n.toDouble / (cap + 1))
          .foreach { case (tok, _) =>
            assert(finalState(sh).contains(tok),
              s"heavy token $tok evicted from shard $sh (N=$n)")
          }
      }
    // bounded state: never more than cap entries per shard
    finalState.foreach { case (sh, m) =>
      assert(m.size <= cap, s"shard $sh state exceeded cap: ${m.size}")
    }
  }

  test("foreachBatch ingest dedup: streamed batches converge to the batch-pipeline index") {
    // the streaming twin of pipeline_ingest's dedup stage: each
    // micro-batch canonicalizes, fingerprints, anti-joins the CURRENT
    // index, and appends only the survivors (copy-on-write versioned
    // snapshots, as in the CDC law). Cross-batch convergence is the
    // point — a doc admitted in batch 1 must reject its re-crawl in
    // batch 2, and the final index must equal the one-shot batch
    // pipeline over the union of all ingested docs.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def canon(c: org.apache.spark.sql.Column) =
      regexp_replace(trim(lower(c)), "\\s+", " ")
    val root = SparkSpec.scratchDir("ingest_dedup")
    val base = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    base.select(xxhash64(canon(col("text"))).as("fp")).distinct()
      .write.parquet(s"$root/v0")
    @volatile var current = s"$root/v0"
    var version = 0
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        version += 1
        val next = s"$root/v$version"
        val idx = batch.sparkSession.read.parquet(current)
        val fresh = batch
          .withColumn("fp", xxhash64(canon(col("text"))))
          .join(idx, Seq("fp"), "left_anti")
          .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        accepted ++= fresh.select(col("doc_id")).as[Long].collect()
        idx.select(col("fp")).unionByName(fresh.select(col("fp")))
          .distinct().write.mode("overwrite").parquet(next)
        current = next
      }.start()
    try {
      // 10 = case/whitespace variant of doc 1 (drop), 11 = novel (keep)
      mem.addData((10L, "  ALPHA beta   gamma "),
        (11L, "novel text one two"))
      q.processAllAvailable()
      // 12 = re-crawl of 11 ACROSS batches (drop: the index grew),
      // 13 = variant of doc 2 (drop), 14 = novel (keep)
      mem.addData((12L, "novel text one two"),
        (13L, "DELTA epsilon zeta"), (14L, "second novel payload"))
      q.processAllAvailable()
    } finally q.stop()
    assert(accepted.sorted == Seq(11L, 14L),
      s"accepted set diverged: ${accepted.sorted}")
    assert(version == 2, s"expected one snapshot per micro-batch: $version")
    val everything = base.unionByName(Seq(
      (10L, "  ALPHA beta   gamma "), (11L, "novel text one two"),
      (12L, "novel text one two"), (13L, "DELTA epsilon zeta"),
      (14L, "second novel payload")).toDF("doc_id", "text"))
    val batchIdx = everything
      .select(xxhash64(canon(col("text"))).as("fp")).distinct()
    val streamIdx = spark.read.parquet(current)
    assert(streamIdx.except(batchIdx).isEmpty
        && batchIdx.except(streamIdx).isEmpty,
      "streamed index must equal the one-shot batch index")
  }

  test("batch session_window matches the gaps-and-islands formulation") {
    // same data, two formulations — the oracle-side SQL logic re-expressed
    // on DataFrames must agree with session_window
    import spark.implicits._
    val rows = Seq(
      (1L, ts(0)), (1L, ts(10)), (1L, ts(50)), // gap 40min -> 2 sessions
      (2L, ts(5))).toDF("user_id", "ts")
    val sess = rows.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("s"), col("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2))).toSet
    assert(sess == Set(
      (1L, "2024-01-01 10:00:00.0", 2L),
      (1L, "2024-01-01 10:50:00.0", 1L),
      (2L, "2024-01-01 10:05:00.0", 1L)), sess.toString)
  }

  test("streamingDriftBuckets + sink-side PSI fold reproduces the batch " +
    "drift trajectory") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = SparkEntry.queries("stream_drift_psi")(spark, sfDir)
      .collect()
      .map(r => r.getTimestamp(0).toString ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    // the reference histogram exactly as the batch side builds it
    val ev = Tables.events(spark, sfDir)
      .select(unix_micros(col("ts")).as("us"), col("ts"), col("value"))
    val mm = ev.agg(min(col("us")), max(col("us"))).head()
    val mid = (mm.getLong(0) + mm.getLong(1)) / 2
    val refB = ev.filter(col("us") <= mid)
      .groupBy(floor(col("value") / 50.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("nr"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tr = refB.values.sum
    val nb = refB.size
    // stream the current half through the windowed histogram as a REAL
    // multi-micro-batch trajectory (r12, verdict item 8): three
    // time-ordered chunks, so the watermark genuinely ADVANCES between
    // batches and window state persists across them — contiguous sorted
    // chunks can never be late (every new ts ≥ the watermark basis),
    // so parity with the batch aggregate must still be exact. The
    // single-batch form this replaces never moved the watermark at all.
    val mem = MemoryStream[(Timestamp, Double)]
    val df = ops.Streaming.streamingDriftBuckets(
      mem.toDF().toDF("ts", "value"))
    val q = df.writeStream.format("memory").queryName("drift")
      .outputMode(OutputMode.Update()).start()
    try {
      val rows = ev.filter(col("us") > mid)
        .select(col("ts"), col("value"))
        .collect().map(r => (r.getTimestamp(0), r.getDouble(1)))
        .sortBy(_._1.getTime)
      val chunk = math.max(1, (rows.length + 2) / 3)
      rows.grouped(chunk).foreach { batch =>
        mem.addData(batch.toSeq: _*)
        q.processAllAvailable()
      }
      val counts = spark.table("drift")
        .groupBy("win_start", "bucket").agg(max("nc").as("nc"))
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1)) -> r.getLong(2))
        .toMap
      // the monitoring sink's fold: PSI + novel mass per window over the
      // ~|buckets|-row stream output
      val folded = counts.groupBy(_._1._1).map { case (w, m) =>
        val bc = m.map { case ((_, b), n) => b -> n }
        val inSup = bc.filter(kv => refB.contains(kv._1))
        val tc = inSup.values.sum
        val novel = bc.filterNot(kv => refB.contains(kv._1)).values.sum
        val psi = refB.map { case (b, nr) =>
          val qq = (inSup.getOrElse(b, 0L) + 0.5) / (tc + 0.5 * nb)
          val pp = (nr + 0.5) / (tr + 0.5 * nb)
          (qq - pp) * math.log(qq / pp)
        }.sum
        w -> ((psi, tc, novel))
      }
      assert(folded.keySet == batch.keySet,
        s"window sets differ: ${folded.keySet} vs ${batch.keySet}")
      folded.foreach { case (w, (psi, tc, novel)) =>
        val (bPsi, bTc, bNovel) = batch(w)
        // the fold's summation order differs from the distributed
        // aggregate's — compare to the rounded precision, not bit-exact
        assert(math.abs(psi - bPsi) < 2e-6, s"$w: psi $psi vs $bPsi")
        assert(tc == bTc, s"$w: in-support count")
        assert(novel == bNovel, s"$w: novel mass")
      }
    } finally q.stop()
  }

  test("stream_drift_psi: a window whose rows ALL fall outside the " +
    "reference support still emits its trajectory row (tc=0, full " +
    "novel mass)") {
    // regression law for the ADVICE r9 finding: the output window list
    // used to derive from the in-support subset, silently dropping a
    // novel-only window — exactly the strongest drift signal. Planted
    // fixture: reference half in buckets 0/1; current half has one
    // in-support window and one window containing ONLY a novel bucket.
    import spark.implicits._
    def t(h: Int): Timestamp =
      Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(h * 3600L))
    val dir = SparkSpec.scratchDir("graft_drift_novel")
    Seq(
      (1L, t(0), 1L, "view", 10.0, "{}"),   // ref: bucket 0
      (2L, t(10), 1L, "view", 60.0, "{}"),  // ref: bucket 1
      (3L, t(24), 1L, "view", 10.0, "{}"),  // ref boundary (us <= mid)
      (4L, t(30), 1L, "view", 10.0, "{}"),  // cur window A: in support
      (5L, t(37), 1L, "view", 5000.0, "{}"), // cur window B: novel ONLY
      (6L, t(48), 1L, "view", 60.0, "{}")   // cur window C + max ts
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("stream_drift_psi")(spark, dir)
      .collect()
      .map(r => r.getTimestamp(0).toString ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    InternalCaches.unpersistAll()
    val novelWin = "2024-01-02 12:00:00.0" // 6h window of hour 37
    assert(rows.contains(novelWin),
      s"novel-only window must not be dropped: ${rows.keySet}")
    val (psi, tc, novel) = rows(novelWin)
    assert(tc == 0L && novel == 1L,
      s"novel-only window must carry (tc=0, n_novel=1): got ($tc, $novel)")
    assert(!psi.isNaN && !psi.isInfinite,
      s"psi must stay finite under an empty in-support histogram: $psi")
    val (_, tcA, novelA) = rows("2024-01-02 06:00:00.0")
    assert(tcA == 1L && novelA == 0L,
      s"in-support window unchanged: ($tcA, $novelA)")
  }

  test("drift trajectory restart law: windowed histogram state survives " +
    "a checkpoint restart with no duplicate or lost window rows") {
    // the r6 recovery contract applied to the drift monitor: kill the
    // query mid-window, restart a NEW query from the same checkpoint,
    // and every finalized (window, bucket) histogram row must reach the
    // sink exactly once, counting rows from BOTH runs — duplicated or
    // lost rows would silently bend every PSI the monitoring sink folds
    // from the trajectory.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def tsh(h: Int, m: Int = 0): Timestamp =
      Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val root = SparkSpec.scratchDir("graft_drift_restart")
    val mem = MemoryStream[(Timestamp, Double)]
    val df = ops.Streaming.streamingDriftBuckets(
      mem.toDF().toDF("ts", "value"))
    def start() = df.writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      // window [00:00, 06:00): bucket 0 (value 10) and bucket 1 (60)
      mem.addData((tsh(0, 10), 10.0), (tsh(0, 20), 60.0))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      mem.addData((tsh(1), 10.0)) // same window+bucket, POST-restart
      q2.processAllAvailable()
      mem.addData((tsh(13), 0.0)) // watermark passes 06:00 → finalize
      q2.processAllAvailable()
      val rows = spark.read.parquet(s"$root/out")
        .filter(col("win_start") === tsh(0))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2)))
      assert(rows.length == rows.map(_._1).distinct.length,
        s"a (window, bucket) row emitted more than once across the " +
          s"restart: ${rows.mkString(",")}")
      assert(rows.toSet == Set((0L, 2L), (1L, 1L)),
        s"restored state must aggregate both runs (bucket 0: 1 pre + " +
          s"1 post; bucket 1: 1 pre): ${rows.mkString(",")}")
    } finally q2.stop()
  }
}
