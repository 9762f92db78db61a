package graft

import graft.etl.ops.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream // Spark 4 moved it under .runtime
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Top-level so Spark can derive an Encoder (inner classes cannot). */
case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)

/** SURVEY §5.4: the §J batch-equivalent aggregations run under Structured
  * Streaming (MemoryStream, micro-batch) and must agree with batch; late
  * data beyond the watermark is dropped in append mode.
  */
class StreamingSpec extends SparkFixture {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // MemoryStream[A] needs an implicit SQLContext
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val base = Seq(
    Ev(ts("2024-01-01 10:05:00"), "click", 1.0, 1L),
    Ev(ts("2024-01-01 10:45:00"), "click", 2.0, 1L),
    Ev(ts("2024-01-01 11:05:00"), "view", 4.0, 2L),
    Ev(ts("2024-01-01 12:00:00"), "click", 8.0, 2L))

  test("tumbling aggregation: streaming complete-mode result equals batch") {
    val sp = spark
    import sp.implicits._
    val stream = MemoryStream[Ev]
    val q = StreamOps.tumblingAgg(stream.toDF())
      .writeStream.format("memory").queryName("tumble_t").outputMode("complete").start()
    try {
      stream.addData(base: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumble_t")
        .select(col("window.start").cast("long").as("ws"), col("event_type"), col("n"), col("sum_value"))
        .collect().map(_.toString).sorted.toSeq
      val batch = StreamOps.tumblingAgg(base.toDF())
        .select(col("window.start").cast("long").as("ws"), col("event_type"), col("n"), col("sum_value"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch)
      assert(streamed.size == 3) // 10h click x2 grouped, 11h view, 12h click
    } finally q.stop()
  }

  test("stream-static enrichment: broadcast dim join under MemoryStream equals batch") {
    val sp = spark
    import sp.implicits._
    // static user → segment dim (the qstream_enrich shape, tiny fixture)
    val dim = Seq((1L, "RETAIL"), (2L, "AUTO")).toDF("user_id", "segment")
    val stream = MemoryStream[Ev]
    val q = StreamOps.enrichAgg(stream.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_t").outputMode("complete").start()
    try {
      stream.addData(base: _*)
      q.processAllAvailable()
      val streamed = spark.table("enrich_t")
        .select(col("window.start").cast("long").as("ws"), col("segment"), col("n"), col("sum_value"))
        .collect().map(_.toString).sorted.toSeq
      val batch = StreamOps.enrichAgg(base.toDF(), dim)
        .select(col("window.start").cast("long").as("ws"), col("segment"), col("n"), col("sum_value"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch)
      // 10h RETAIL x2, 11h AUTO, 12h AUTO — the dim attached to every event
      assert(streamed.size == 3)
    } finally q.stop()
  }

  test("windowed top-k: ranking the complete-mode sink equals the batch rank (qstream_topk pattern)") {
    val sp = spark
    import sp.implicits._
    val stream = MemoryStream[Ev]
    val q = StreamOps.tumblingAgg(stream.toDF())
      .writeStream.format("memory").queryName("topk_t").outputMode("complete").start()
    try {
      stream.addData(base: _*)
      stream.addData(Ev(ts("2024-01-01 10:20:00"), "view", 3.0, 2L))
      q.processAllAvailable()
      def rank2(df: org.apache.spark.sql.DataFrame) = df
        .select(col("window.start").cast("long").as("ws"), col("event_type"), col("n"))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("ws"))
            .orderBy(col("n").desc, col("event_type"))))
        .filter(col("rnk") <= 2)
        .collect().map(_.toString).sorted.toSeq
      // the rank runs DOWNSTREAM of the streaming sink, per trigger — the
      // pattern qstream_topk mirrors in batch form
      val streamed = rank2(spark.table("topk_t"))
      val batch = rank2(StreamOps.tumblingAgg((base :+
        Ev(ts("2024-01-01 10:20:00"), "view", 3.0, 2L)).toDF()))
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("file source: readStream over a parquet directory equals batch (the production ingest path)") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    try {
      // two "micro-batch arrivals" written as separate files
      base.take(2).toDF().write.parquet(s"$dir/batch1")
      base.drop(2).toDF().write.parquet(s"$dir/batch2")
      val schema = base.toDF().schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1) // force multiple micro-batches
        .parquet(s"$dir/*")
      val q = StreamOps.tumblingAgg(stream)
        .writeStream.format("memory").queryName("filesrc_t").outputMode("complete").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("filesrc_t")
          .select(col("window.start").cast("long").as("ws"), col("event_type"),
            col("n"), col("sum_value"))
          .collect().map(_.toString).sorted.toSeq
        val batch = StreamOps.tumblingAgg(base.toDF())
          .select(col("window.start").cast("long").as("ws"), col("event_type"),
            col("n"), col("sum_value"))
          .collect().map(_.toString).sorted.toSeq
        assert(streamed == batch && streamed.size == 3)
      } finally q.stop()
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("watermark: a row later than 10 minutes behind max ts is dropped (append mode)") {
    val sp = spark
    import sp.implicits._
    val stream = MemoryStream[Ev]
    val agg = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("late_t").outputMode("append").start()
    try {
      stream.addData(base: _*)
      q.processAllAvailable()
      // advance watermark far past 10:xx windows
      stream.addData(Ev(ts("2024-01-01 14:00:00"), "click", 1.0, 3L))
      q.processAllAvailable()
      val closedAfterAdvance = spark.table("late_t").count()
      // this event is hours behind the watermark — must not reopen 10:00
      stream.addData(Ev(ts("2024-01-01 10:07:00"), "click", 99.0, 9L))
      // one more on-time event so a batch actually runs and emits nothing stale
      stream.addData(Ev(ts("2024-01-01 14:30:00"), "view", 1.0, 3L))
      q.processAllAvailable()
      val rows = spark.table("late_t")
        .select(col("window.start").cast("long"), col("event_type"), col("n"))
        .collect().map(_.toString).toSet
      // the late 10:07 click must not appear as a new emission
      assert(spark.table("late_t").count() >= closedAfterAdvance)
      assert(!rows.exists(r => r.contains("99")))
      // the 10:00 click window was emitted exactly once with n=2 (not 3)
      val tenOClock = java.time.Instant.parse("2024-01-01T10:00:00Z").getEpochSecond
      assert(rows.contains(s"[$tenOClock,click,2]"))
    } finally q.stop()
  }

  test("session windows: streaming equals batch; 30-min gap splits sessions") {
    val sp = spark
    import sp.implicits._
    val evs = Seq(
      Ev(ts("2024-01-01 09:00:00"), "click", 1.0, 7L),
      Ev(ts("2024-01-01 09:20:00"), "click", 1.0, 7L), // same session (gap 20m)
      Ev(ts("2024-01-01 09:50:00"), "click", 1.0, 7L), // same session (gap 30m exclusive end -> merges? gap == 30m exactly is a new session)
      Ev(ts("2024-01-01 11:00:00"), "click", 1.0, 7L)) // new session
    val stream = MemoryStream[Ev]
    val q = StreamOps.sessionAgg(stream.toDF())
      .writeStream.format("memory").queryName("sess_t").outputMode("complete").start()
    try {
      stream.addData(evs: _*)
      q.processAllAvailable()
      val streamed = spark.table("sess_t")
        .select(col("user_id"), col("session_window.start").cast("long"), col("n_events"))
        .collect().map(_.toString).sorted.toSeq
      val batch = StreamOps.sessionAgg(evs.toDF())
        .select(col("user_id"), col("session_window.start").cast("long"), col("n_events"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("file-source streaming: readStream over a parquet directory equals batch") {
    // the §J aggregations must also run against a real file stream, not
    // just MemoryStream: copy the sf0.001 events into a stream directory
    // and micro-batch it one file at a time.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val events = graft.etl.Tables.events(spark, sfTiny)
    events.repartition(3).write.mode("overwrite").parquet(dir)
    val streamed = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = StreamOps.tumblingAgg(streamed)
      .writeStream.format("memory").queryName("file_t").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_t")
        .select(col("window.start").cast("long"), col("event_type"), col("n"), col("sum_value"))
        .collect().map(_.toString).sorted.toSeq
      val want = StreamOps.tumblingAgg(events)
        .select(col("window.start").cast("long"), col("event_type"), col("n"), col("sum_value"))
        .collect().map(_.toString).sorted.toSeq
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("funnel: incremental bounded-state stream equals the batch join shape") {
    val sp = spark
    import sp.implicits._
    val batch1 = Seq(
      Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      Ev(ts("2024-01-01 10:30:00"), "purchase", 1.0, 1L),
      Ev(ts("2024-01-01 10:10:00"), "click", 1.0, 2L))
    val batch2 = Seq(
      Ev(ts("2024-01-01 09:50:00"), "click", 1.0, 1L), // earlier click, still before fp
      Ev(ts("2024-01-01 11:00:00"), "purchase", 1.0, 2L),
      Ev(ts("2024-01-01 09:00:00"), "purchase", 1.0, 2L)) // earlier purchase arrives later
    val stream = MemoryStream[Ev]
    // generous watermark: nothing in batch2 is late, so streaming must
    // agree with batch exactly (the bound kicks in only for truly late data)
    val out = StreamOps.funnelStream(stream.toDF(), "6 hours",
      java.time.Duration.ofHours(24))
    val q = out.toDF().writeStream.format("memory").queryName("funnel_t")
      .outputMode("update").start()
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val emitted = spark.table("funnel_t").collect().map(_.toString).toSet
      val want = StreamOps.funnel((batch1 ++ batch2).toDF())
        .collect().map(_.toString).toSet
      // update mode re-emits per batch; the final (all-events) state rows
      // must be present and equal the batch join shape over the same events
      assert(want.subsetOf(emitted), s"want $want within $emitted")
      // user 2's later-arriving earlier purchase moved fp back, zeroing the count
      assert(want.exists(_.startsWith("[2,")), want.mkString(";"))
    } finally q.stop()
  }

  test("funnel: watermark compaction bounds pending clicks; idle keys evict") {
    import graft.etl.ops.{FunnelEvent, FunnelState}
    val sp = spark
    import sp.implicits._
    val stream = MemoryStream[Ev]
    val out = StreamOps.funnelStream(stream.toDF(), "10 minutes",
      java.time.Duration.ofMinutes(30))
    val q = out.toDF().writeStream.format("memory").queryName("funnel_evict_t")
      .outputMode("update").start()
    try {
      // user 9 clicks and never purchases — the unbounded-state hazard
      stream.addData(
        Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 9L),
        Ev(ts("2024-01-01 10:01:00"), "click", 1.0, 9L))
      q.processAllAvailable()
      // advance the watermark hours past user 9's traffic + idle gap
      stream.addData(Ev(ts("2024-01-01 15:00:00"), "click", 1.0, 8L))
      q.processAllAvailable()
      // one more batch so the timeout fires (timeouts run on batch boundaries)
      stream.addData(Ev(ts("2024-01-01 15:05:00"), "click", 1.0, 8L))
      q.processAllAvailable()
      val stateRows = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .lastOption.map(_.numRowsTotal)
      // user 9's state is gone; only user 8 (recent traffic) remains
      assert(stateRows.contains(1L), s"state not evicted: $stateRows")
      // no-purchase eviction emits nothing
      assert(!spark.table("funnel_evict_t").collect().exists(_.getLong(0) == 9L))
    } finally q.stop()

    // the compaction invariant directly: clicks below min(fp, watermark)
    // fold into the confirmed counter, clicks >= fp drop, result unchanged
    val st0 = Seq(
      FunnelEvent(1L, 100L, "click"), FunnelEvent(1L, 200L, "click"),
      FunnelEvent(1L, 500L, "purchase"), FunnelEvent(1L, 900L, "click"))
      .foldLeft(FunnelState.empty)(FunnelState.update)
    val compacted = FunnelState.compact(st0, 300L)
    assert(compacted.confirmed == 2L && compacted.pending.isEmpty, compacted)
    assert(compacted.result(1L) == st0.result(1L))
    // fp not yet final (watermark below it): a click in [wm, fp) stays pending
    val st1 = Seq(
      FunnelEvent(2L, 400L, "click"), FunnelEvent(2L, 500L, "purchase"))
      .foldLeft(FunnelState.empty)(FunnelState.update)
    val c1 = FunnelState.compact(st1, 300L)
    assert(c1.pending == Vector(400L) && c1.confirmed == 0L, c1)
  }

  test("stream-stream interval join: purchases matched to clicks within one hour") {
    val sp = spark
    import sp.implicits._
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val c = clicks.toDF().filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val p = purchases.toDF().filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    // both sides watermarked + a bounded time-interval condition: Spark can
    // expire join state — the only stream-stream join shape that survives
    // an unbounded run
    val joined = c.join(p, expr(
      "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 1 hour"))
    val q = joined.writeStream.format("memory").queryName("ssjoin_t")
      .outputMode("append").start()
    try {
      clicks.addData(
        Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
        Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 2L))
      purchases.addData(
        Ev(ts("2024-01-01 10:30:00"), "purchase", 5.0, 1L), // within the hour
        Ev(ts("2024-01-01 12:00:00"), "purchase", 9.0, 2L)) // outside it
      q.processAllAvailable()
      val rows = spark.table("ssjoin_t")
        .select(col("c_user"), col("p_ts").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L,
        java.time.Instant.parse("2024-01-01T10:30:00Z").getEpochSecond)), rows)
    } finally q.stop()
  }

  test("interval join parity: streaming rows equal batch rows, boundaries exact") {
    // the qstream_join condition: clicks in (p_ts - 24h, p_ts]. user 1 is
    // inside the window, user 2 sits EXACTLY at p_ts - 24h (strict > ⇒
    // excluded), user 3 clicks at the purchase instant (<= ⇒ included)
    val sp = spark
    import sp.implicits._
    val clickRows = Seq(
      Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      Ev(ts("2024-01-01 08:00:00"), "click", 1.0, 2L),
      Ev(ts("2024-01-01 07:00:00"), "click", 1.0, 3L))
    val purchaseRows = Seq(
      Ev(ts("2024-01-02 09:59:00"), "purchase", 5.0, 1L),
      Ev(ts("2024-01-02 08:00:00"), "purchase", 5.0, 2L),
      Ev(ts("2024-01-01 07:00:00"), "purchase", 5.0, 3L))
    val cond = "c_user = p_user AND c_ts > p_ts - interval 24 hours AND c_ts <= p_ts"
    def shape(c: org.apache.spark.sql.DataFrame, p: org.apache.spark.sql.DataFrame) =
      c.select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        .join(p.select(col("user_id").as("p_user"), col("ts").as("p_ts")), expr(cond))
        .select(col("c_user"), col("p_ts").cast("long"))
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val sc = clicks.toDF().withColumn("ts", col("ts")).withWatermark("ts", "10 minutes")
    val spu = purchases.toDF().withWatermark("ts", "10 minutes")
    val q = shape(sc, spu).writeStream.format("memory")
      .queryName("ssjoin_parity").outputMode("append").start()
    try {
      clicks.addData(clickRows: _*)
      purchases.addData(purchaseRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_parity")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = shape(clickRows.toDF(), purchaseRows.toDF())
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(batch.map(_._1) == Set(1L, 3L), s"boundary semantics drifted: $batch")
    } finally q.stop()
  }

  test("parquet sink with checkpoint: restart resumes exactly-once, no dup rows") {
    val sp = spark
    import sp.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val stream = MemoryStream[Ev]
    def start() = stream.toDF()
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .outputMode("append").start()
    val batch1 = Seq(
      Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      Ev(ts("2024-01-01 10:05:00"), "view", 2.0, 2L))
    val batch2 = Seq(
      Ev(ts("2024-01-01 10:10:00"), "purchase", 3.0, 1L))
    val q1 = start()
    try { stream.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    stream.addData(batch2: _*) // arrives while the query is down
    val q2 = start() // same checkpoint: resumes past batch1's offsets
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.schema(batch1.toDF().schema).parquet(outDir)
      .collect().map(_.toString).sorted.toSeq
    val want = (batch1 ++ batch2).toDF().collect().map(_.toString).sorted.toSeq
    assert(got == want, s"got $got want $want") // every row exactly once
  }

  test("foreachBatch overwrite-by-batchId sink: a mid-batch kill replays without dup rows") {
    // The sink third of the exactly-once triangle (source offsets and
    // aggregate state are pinned by the two tests around this one): the
    // built-in file sink gets exactly-once from its own commit log, but
    // every external-system sink goes through foreachBatch, whose
    // contract is AT-LEAST-once delivery + a (batchId, data) pair that is
    // STABLE across replays — idempotence is the sink author's job. The
    // production recipe: partition the output by batchId and OVERWRITE
    // that partition, so a replayed batch replaces its own partial write
    // instead of appending a duplicate. This test injects the worst-case
    // failure point — AFTER the sink write durably lands, BEFORE the
    // streaming commit log records the batch — restarts from the same
    // checkpoint, and asserts the replay leaves every row exactly once.
    val sp = spark
    import sp.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("graft_fb_sink").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_fb_ckpt").toString
    val stream = MemoryStream[Ev]
    @volatile var killNext = false
    def start() = stream.toDF().writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // idempotent sink: overwrite THIS batch's partition only
        df.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        if (killNext) { killNext = false; sys.error("injected kill after sink write, before commit") }
      }
      .outputMode("append").start()
    val batch1 = Seq(
      Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      Ev(ts("2024-01-01 10:05:00"), "view", 2.0, 2L))
    val batch2 = Seq(
      Ev(ts("2024-01-01 10:10:00"), "purchase", 3.0, 1L))
    val q1 = start()
    try { stream.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    // second batch: the sink write lands, then the query dies before the
    // commit log entry — the exact window where a naive append sink dups
    killNext = true
    stream.addData(batch2: _*)
    val q2 = start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    // the partial write is already on disk (that's the premise) — assert
    // the KILLED batch's partition specifically (batch_id=1): batch_id=0
    // from the first healthy batch would satisfy a bare prefix check
    // without verifying the partial write actually landed
    assert(new java.io.File(outDir, "batch_id=1").isDirectory,
      "injected kill must land AFTER the sink write (batch_id=1 on disk)")
    val q3 = start() // same checkpoint: the uncommitted batch REPLAYS
    try q3.processAllAvailable() finally q3.stop()
    val got = sp.read.schema(batch1.toDF().schema)
      .option("basePath", outDir).parquet(s"$outDir/batch_id=*")
      .select(col("ts"), col("event_type"), col("value"), col("user_id"))
      .collect().map(_.toString).sorted.toSeq
    val want = (batch1 ++ batch2).toDF()
      .collect().map(_.toString).sorted.toSeq
    assert(got == want, s"replayed batch duplicated or lost rows: got $got want $want")
  }

  test("state-store recovery: aggregate counts survive a checkpointed restart (file source)") {
    // The production streaming property: kill a query mid-stream, restart
    // from its checkpoint, and the recovered STATE (not just the source
    // offsets) must make the final aggregate exactly-once over all input.
    // File source + complete-mode memory sink is the recovery-supported
    // combination; a broken state recovery shows up as counts covering
    // only post-restart files, a broken offset recovery as double counts.
    val sp = spark
    import sp.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt2").toString
    val batch1 = Seq(
      Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      Ev(ts("2024-01-01 10:05:00"), "click", 2.0, 2L),
      Ev(ts("2024-01-01 10:06:00"), "view", 4.0, 2L))
    val batch2 = Seq(
      Ev(ts("2024-01-01 10:10:00"), "click", 8.0, 1L),
      Ev(ts("2024-01-01 10:11:00"), "purchase", 16.0, 3L))
    val schema = batch1.toDF().schema
    batch1.toDF().write.mode("append").parquet(srcDir)
    def start() = sp.readStream.schema(schema).parquet(srcDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .writeStream.format("memory").queryName("agg_restart_t")
      .option("checkpointLocation", ckptDir)
      .outputMode("complete").start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      val mid = spark.table("agg_restart_t")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(mid == Map("click" -> ((2L, 3.0)), "view" -> ((1L, 4.0))), s"pre-restart: $mid")
    } finally q1.stop()
    batch2.toDF().write.mode("append").parquet(srcDir) // lands while the query is down
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.table("agg_restart_t")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      // batch1 rows are counted from RECOVERED state (the restarted query
      // never re-reads their files), batch2 rows exactly once on top
      assert(got == Map(
        "click" -> ((3L, 11.0)), "view" -> ((1L, 4.0)), "purchase" -> ((1L, 16.0))),
        s"post-restart: $got")
    } finally q2.stop()
  }

  test("mapGroupsWithState state survives a checkpointed restart (stale update still ignored)") {
    import graft.etl.ops.CdcEvent
    val sp = spark
    import sp.implicits._
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt3").toString
    val emitDir = java.nio.file.Files.createTempDirectory("graft_emit").toString
    val stream = MemoryStream[CdcEvent]
    // foreachBatch sink (recovery-supported, unlike non-complete memory
    // sink): append each update-batch's emissions to parquet so the
    // post-restart emissions are observable on their own.
    def start() = StreamOps.cdcSnapshot(stream.toDF()).toDF()
      .writeStream
      .option("checkpointLocation", ckptDir)
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(emitDir); ()
      }
      .start()
    val q1 = start()
    try {
      stream.addData(
        CdcEvent(1L, 200L, 2L, "view", "2.0"),
        CdcEvent(2L, 50L, 3L, "click", "3.0"))
      q1.processAllAvailable()
    } finally q1.stop()
    val preRestart = spark.read.parquet(emitDir).collect().map(_.toString).toSet
    assert(preRestart.contains("[1,200,2,view,2.0]"), s"pre-restart: $preRestart")
    val q2 = start() // same checkpoint: per-key GroupState must be restored
    try {
      stream.addData(
        CdcEvent(1L, 150L, 4L, "click", "9.9"), // OLDER than key 1's held state
        CdcEvent(3L, 10L, 6L, "click", "5.0")) // new key
      q2.processAllAvailable()
      val all = spark.read.parquet(emitDir).collect().map(_.toString).toSet
      val postRestart = all -- preRestart
      // state recovered ⇒ the stale update is ignored (no emission for
      // key 1 at ts 150 — with LOST state it would win and be emitted)
      assert(!all.contains("[1,150,4,click,9.9]"), s"stale update emitted: $all")
      assert(postRestart.contains("[3,10,6,click,5.0]"), s"post-restart: $postRestart")
    } finally q2.stop()
  }

  test("foreachBatch: streaming micro-batches upsert a keyed target (latest wins)") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.DataFrame
    val target = java.nio.file.Files.createTempDirectory("graft_upsert_t").toString
    val stream = MemoryStream[Ev]
    val schema = Seq((0L, 0L, 0.0)).toDF("user_id", "ts_us", "value").schema
    val q = stream.toDF()
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // MERGE-on-files: current state ∪ batch, keep the latest version
        // per key (ties to the larger value for determinism here).
        val current =
          if (new java.io.File(target).listFiles() != null &&
              new java.io.File(target).list().exists(_.endsWith(".parquet")))
            spark.read.schema(schema).parquet(target)
          else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(desc("ts_us"), desc("value"))
        val merged = current.unionByName(batch)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .localCheckpoint() // materialize BEFORE overwriting what we read
        merged.write.mode("overwrite").parquet(target)
        ()
      }
      .start()
    try {
      stream.addData(
        Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
        Ev(ts("2024-01-01 10:00:00"), "click", 5.0, 2L))
      q.processAllAvailable()
      stream.addData(
        Ev(ts("2024-01-01 11:00:00"), "click", 9.0, 1L)) // newer version of user 1
      q.processAllAvailable()
      val state = spark.read.schema(schema).parquet(target)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(state.keySet == Set(1L, 2L))
      assert(state(1L)._2 == 9.0, s"user 1 must hold the newer version: $state")
      assert(state(2L)._2 == 5.0)
    } finally q.stop()
  }

  test("cdc snapshot: mapGroupsWithState latest-per-key equals the batch row_number rule") {
    import graft.etl.ops.CdcEvent
    val sp = spark
    import sp.implicits._
    val b1 = Seq(
      CdcEvent(1L, 100L, 1L, "click", "1.0"),
      CdcEvent(1L, 200L, 2L, "view", "2.0"),
      CdcEvent(2L, 50L, 3L, "click", "3.0"))
    val b2 = Seq(
      CdcEvent(1L, 150L, 4L, "click", "9.9"), // older than held state: ignored
      CdcEvent(2L, 50L, 5L, "view", "4.0"), // same ts, higher event_id wins
      CdcEvent(3L, 10L, 6L, "click", "5.0")) // new key
    val stream = MemoryStream[CdcEvent]
    val q = StreamOps.cdcSnapshot(stream.toDF()).toDF()
      .writeStream.format("memory").queryName("cdc_t").outputMode("update").start()
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
      val emitted = spark.table("cdc_t").collect().map(_.toString).toSet
      // the final snapshot = the batch rule (max (ts_us, event_id) per key)
      // applied to ALL events; update mode must have emitted each of them
      val want = StreamOps.cdcSnapshot((b1 ++ b2).toDF()).toDF()
        .collect().map(_.toString).toSet
      assert(want == Set(
        "[1,200,2,view,2.0]", "[2,50,5,view,4.0]", "[3,10,6,click,5.0]"))
      assert(want.subsetOf(emitted), s"want $want within $emitted")
      // the stale b2 update for user 1 must NOT appear as a newer emission
      assert(!emitted.contains("[1,150,4,click,9.9]"))
    } finally q.stop()
  }

  test("session gap semantics: diff == gap exactly MERGES (oracle parity)") {
    val sp = spark
    import sp.implicits._
    val evs = Seq(
      Ev(ts("2024-01-01 09:00:00"), "click", 1.0, 1L),
      Ev(ts("2024-01-01 09:30:00"), "click", 1.0, 1L)) // exactly 30 min later
    val sessions = StreamOps.sessionAgg(evs.toDF()).collect()
    // Spark session_window merges an event landing exactly on the previous
    // session's end (verified empirically) — one session [09:00, 10:00].
    // The DuckDB oracle therefore splits only on diff > gap, strictly.
    assert(sessions.length == 1, sessions.mkString(";"))
  }
}
