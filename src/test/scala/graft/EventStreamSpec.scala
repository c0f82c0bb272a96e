package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Streaming semantics vs their batch twins (q22/q23). */
class EventStreamSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private def eventsDir: String = {
    val dir = Files.createTempDirectory("events_stream").toString
    // single file → single micro-batch: the parquet files are not
    // time-ordered, so multi-batch reads would legitimately time out
    // sessions that a later file extends (watermark semantics) and the
    // batch-equivalence below would not hold.
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streamed windowed counts equal the batch aggregation") {
    val dir = eventsDir
    val batchDf = spark.read.parquet(dir)
    val streamDf = spark.readStream.schema(batchDf.schema).parquet(dir)

    val q = EventStream.windowedCounts(streamDf, "1 hour", "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .select("window_start", "event_type", "n_events", "total_value")
        .collect().map(_.toSeq).toSet
      val batch = EventStream.windowedCounts(batchDf, "1 hour", "10 minutes")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("sessionize emits gap-separated sessions; timeout closes the tail") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = EventStream.sessionize(spark, mem.toDS(), gapSeconds = 1800, "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      // user 7: two events 5 min apart (one session), then a 2h gap
      mem.addData(
        Event(1, ts(0), 7, "click", 1.0),
        Event(2, ts(5), 7, "view", 2.0),
        Event(3, ts(125), 7, "click", 3.0))
      q.processAllAvailable()
      // first session closes in-batch at the 2h gap
      val closed = spark.table("sess_out").as[EventStream.SessionSummary].collect()
      assert(closed.length == 1)
      assert(closed.head.user_id == 7 && closed.head.session_id == 1 &&
        closed.head.n_events == 2)

      // advancing the watermark far past the open session times it out
      mem.addData(Event(4, ts(100000), 99, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(5, ts(100001), 99, "view", 1.0))
      q.processAllAvailable()
      val all = spark.table("sess_out").as[EventStream.SessionSummary].collect()
      val u7 = all.filter(_.user_id == 7).sortBy(_.session_id)
      assert(u7.length == 2, s"expected the tail session to time out, got ${u7.toSeq}")
      assert(u7(1).session_id == 2 && u7(1).n_events == 1)

      // tombstone: a post-timeout event for user 7 must get session id
      // 3 — never a reused id 1/2 (emitted keys stay unique)
      mem.addData(Event(6, ts(100002), 7, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(7, ts(400000), 99, "view", 1.0)) // advance watermark
      q.processAllAvailable()
      val u7b = spark.table("sess_out").as[EventStream.SessionSummary].collect()
        .filter(_.user_id == 7).sortBy(_.session_id)
      assert(u7b.map(_.session_id).toSeq == Seq(1L, 2L, 3L),
        s"session ids must stay unique after timeout, got ${u7b.toSeq}")
    } finally q.stop()
  }

  test("an event far behind the watermark cannot kill the query") {
    // Spark 4.1 drops late rows BEFORE flatMapGroupsWithState (verified
    // here via numRowsDroppedByWatermark), so a surviving row always has
    // ts >= watermark and its natural timeout (end + gap) lands beyond
    // the watermark. The setTimeout clamp in sessionize() is defense for
    // versions/configs where boundary rows do reach the function — this
    // test pins today's semantics: row dropped, query alive, no phantom
    // session, no IllegalArgumentException.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = EventStream.sessionize(spark, mem.toDS(), gapSeconds = 1800, "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_late").start()
    try {
      def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      mem.addData(Event(1, ts(100000), 2, "click", 1.0)) // watermark → ~t+100000min
      q.processAllAvailable()
      mem.addData(Event(2, ts(10), 3, "click", 1.0)) // far beyond the watermark
      q.processAllAvailable() // must not throw
      assert(q.lastProgress.stateOperators.map(_.numRowsDroppedByWatermark).sum == 1L)
      mem.addData(Event(3, ts(200000), 2, "view", 1.0))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val u3 = spark.table("sess_late").as[EventStream.SessionSummary].collect()
        .filter(_.user_id == 3)
      assert(u3.isEmpty, "a watermark-dropped row must not create a session")
    } finally q.stop()
  }

  test("stream-stream interval join equals its batch twin") {
    val dir = eventsDir
    val batchDf = spark.read.parquet(dir)
    val streamDf = spark.readStream.schema(batchDf.schema).parquet(dir)
    val q = EventStream.correlate(streamDf, "click", "purchase", 1800, "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("corr_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("corr_out").collect().map(_.toSeq).toSet
      val batch = EventStream.correlate(batchDf, "click", "purchase", 1800, "0 seconds")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("correlateOuter streams null rows once the watermark closes the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = EventStream.correlateOuter(mem.toDF(), "click", "purchase",
      withinSeconds = 1800, watermark = "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("corr_outer").start()
    try {
      def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      // c1 converts (p1 within 30 min); c2 never converts; p3 is a
      // purchase with no click (left outer: must NOT emit)
      mem.addData(
        Event(1, ts(0), 1, "click", 0), Event(2, ts(10), 1, "purchase", 5),
        Event(3, ts(0), 2, "click", 0),
        Event(4, ts(0), 3, "purchase", 7))
      q.processAllAvailable()
      // sentinel pair a day later: advances the watermark far past
      // c2's window, forcing its null row out in this or the next batch
      mem.addData(
        Event(90, ts(1440), 9, "click", 0), Event(91, ts(1441), 9, "purchase", 1))
      q.processAllAvailable()
      // c8 two days later: pending inside the live horizon at stop —
      // its null row is OWED, not emitted
      mem.addData(Event(80, ts(2880), 8, "click", 0))
      q.processAllAvailable()

      val streamed = spark.table("corr_outer")
        .select(col("user_id"), col("a_id"), col("b_id"), col("gap_us"))
        .collect().map(_.toSeq).toSet
      assert(streamed.contains(Seq(1L, 1L, 2L, 600000000L)), streamed)   // match
      assert(streamed.contains(Seq(2L, 3L, null, null)), streamed)       // null row
      assert(streamed.contains(Seq(9L, 90L, 91L, 60000000L)), streamed)  // sentinel
      assert(!streamed.exists(_(1) == 80L), "c8 is inside the horizon — owed, not emitted")
      assert(!streamed.exists(r => r(2) == 4L), "purchase without click must not emit")

      // the batch twin on the same events equals streamed + the owed row
      val batchDf = Seq(
        Event(1, ts(0), 1, "click", 0), Event(2, ts(10), 1, "purchase", 5),
        Event(3, ts(0), 2, "click", 0), Event(4, ts(0), 3, "purchase", 7),
        Event(90, ts(1440), 9, "click", 0), Event(91, ts(1441), 9, "purchase", 1),
        Event(80, ts(2880), 8, "click", 0)).toDF()
      val batch = EventStream.correlateOuter(batchDf, "click", "purchase", 1800, "0 seconds")
        .collect().map(_.toSeq).toSet
      assert(batch == streamed + Seq(8L, 80L, null, null))
    } finally q.stop()
  }

  test("correlateFull also streams the unmatched purchase once its window closes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.correlateFull(mem.toDF(), "click", "purchase", 1800, "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("corr_full").start()
    try {
      def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      mem.addData(
        Event(1, ts(0), 1, "click", 0), Event(2, ts(10), 1, "purchase", 5),
        Event(3, ts(0), 2, "click", 0),          // never converts
        Event(4, ts(0), 3, "purchase", 7))       // no click anywhere
      q.processAllAvailable()
      mem.addData(Event(90, ts(1440), 9, "click", 0)) // watermark push
      q.processAllAvailable()
      mem.addData(Event(91, ts(2880), 9, "purchase", 0)) // second push
      q.processAllAvailable()

      val streamed = spark.table("corr_full")
        .select(col("user_id"), col("a_id"), col("b_id"), col("gap_us"))
        .collect().map(_.toSeq).toSet
      assert(streamed.contains(Seq(1L, 1L, 2L, 600000000L)), streamed)
      assert(streamed.contains(Seq(2L, 3L, null, null)), streamed) // left null
      assert(streamed.contains(Seq(3L, null, 4L, null)), streamed) // RIGHT null
    } finally q.stop()
  }

  test("dedupedStream collapses duplicate event ids to the batch distinct") {
    val dir = Files.createTempDirectory("events_dup").toString
    val base = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
    base.unionAll(base).coalesce(1).write.mode("overwrite").parquet(dir)
    val batchDf = spark.read.parquet(dir)
    val streamDf = spark.readStream.schema(batchDf.schema).parquet(dir)
    val q = EventStream.dedupedStream(streamDf, "10 minutes", Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dedup_out")
      assert(streamed.count() == base.count())
      assert(streamed.select("event_id").distinct().count() == base.count())
    } finally q.stop()
  }

  test("streaming sessionize agrees with the batch q22 on session counts") {
    import spark.implicits._
    val dir = eventsDir
    val batchDf = spark.read.parquet(dir)
    val streamDf = spark.readStream.schema(batchDf.schema).parquet(dir)
    val q = EventStream.sessionize(spark,
        streamDf.as[Event], gapSeconds = 1800, "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sess_b").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess_b").as[EventStream.SessionSummary].collect()
      val batch = SparkEntry.queries("q22_sessionize")(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
          r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"))).toSet
      val streamedSet = streamed.map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events)).toSet
      // every emitted session exactly matches a batch session (no
      // splits, no duplicates, identical boundaries)
      assert(streamed.length == streamedSet.size)
      assert(streamedSet.subsetOf(batch))
      // the only sessions NOT emitted are those still inside the gap
      // horizon of the final watermark (max event time), which remain
      // open in state — event-time timeout semantics.
      val maxTsUs = batchDf.select(max(unix_micros(col("ts")))).collect().head.getLong(0)
      val expectedOpen = batch.count { case (_, _, endUs, _) => endUs + 1800L * 1000000L > maxTsUs }
      assert(batch.size - streamedSet.size == expectedOpen)
    } finally q.stop()
  }

  test("transformWithState running totals accumulate across micro-batches to the batch sums") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // the arbitrary-state operator requires the RocksDB-backed store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.runningTotals(spark, mem.toDS())
      .writeStream.outputMode("update").format("memory").queryName("twr_out").start()
    try {
      def ev(id: Long, user: Long, v: Double) = EventStream.Event(
        id, new java.sql.Timestamp(1700000000000L + id * 1000L), user, "view", v)
      mem.addData(ev(1, 1, 1.5), ev(2, 1, 2.25), ev(3, 2, 10.0))
      q.processAllAvailable()
      mem.addData(ev(4, 1, 0.25), ev(5, 2, 1.0), ev(6, 3, 7.0))
      q.processAllAvailable()
      // the cumulative row with the highest n_events per user is final
      val fin = spark.table("twr_out")
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("total_micros"))).as("m"))
        .select(col("user_id"), col("m.n_events"), col("m.total_micros"))
        .as[(Long, Long, Long)].collect().toSet
      assert(fin == Set((1L, 3L, 4000000L), (2L, 2L, 11000000L), (3L, 1L, 7000000L)))
      // state genuinely crossed the batch boundary: user 1's second
      // emission reports 3 cumulative events, not 1
      val user1 = spark.table("twr_out").filter(col("user_id") === 1)
        .select("n_events").as[Long].collect().toSet
      assert(user1 == Set(2L, 3L))
    } finally {
      q.stop()
      prevProvider.fold(spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    }
  }

  test("native session_window stream agrees with the batch q100") {
    val dir = eventsDir
    val batchDf = spark.read.parquet(dir)
    val streamDf = spark.readStream.schema(batchDf.schema).parquet(dir)
    val q = EventStream.sessionWindowAgg(streamDf, "30 minutes", Some("0 seconds"))
      .writeStream.outputMode("append").format("memory").queryName("sw_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sw_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
          r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events")))
      val batch = SparkEntry.queries("q100_session_window")(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
          r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"))).toSet
      val streamedSet = streamed.toSet
      // every finalized session matches the batch result exactly —
      // same boundaries, same counts, no splits, no duplicates
      assert(streamed.length == streamedSet.size)
      assert(streamedSet.subsetOf(batch))
      assert(streamedSet.nonEmpty)
      // append mode holds back only sessions whose window end is not
      // yet past the final watermark (max event time)
      val maxTsUs = batchDf.select(max(unix_micros(col("ts")))).collect().head.getLong(0)
      val expectedOpen = batch.count { case (_, _, endUs, _) => endUs > maxTsUs }
      assert(batch.size - streamedSet.size == expectedOpen)
    } finally q.stop()
  }
}
