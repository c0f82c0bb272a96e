package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Reproducible driver behind SCALE.md's STREAMED-STATE row: measures
  * the q149 streamed-KMV state store at 1× and 10× event volume and
  * prints the state-operator metrics from the query's own progress
  * (`StateOperatorProgress.numRowsTotal` / `memoryUsedBytes`) — the
  * number backing the "state bounds, not data volume" claim. The 10×
  * corpus replicates every event with a fresh event_id (disjoint hash
  * domains, same event-type key set), so input rows grow 10× while
  * the per-key sketch stays k longs: state rows must be IDENTICAL
  * across volumes and state bytes flat, or the mergeable-sketch
  * story is broken.
  *
  * `runMain graft.StateScaleProbe <sfDir> [replicas]` (default 10)
  * prints one `STATE <volume>x rows=<input> stateRows=<n>
  * stateBytes=<b> batches=<k>` line per volume.
  */
object StateScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StateScaleProbe <sfDir> [replicas]")
    val dir = args(0)
    val replicas = if (args.length > 1) args(1).toInt else 10
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // transformWithState requires the multi-column-family store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val base = Tables.events(spark, dir)
      .select(col("event_id").cast("long"), col("event_type"))
      .as[(Long, String)].collect()

    Seq(1, replicas).foreach { mult =>
      // fresh ids per replica: disjoint hash domains, same key set
      val rows = (0 until mult).flatMap(i =>
        base.map { case (id, t) => (id + i.toLong * 1000000000L, t) })
      val ms = MemoryStream[(Long, String)]
      val stream = ms.toDF().toDF("event_id", "event_type")
      val out = graft.streaming.EventStream
        .kmvSketchStream(spark, stream, k = 32)
      val sink = s"probe_state_${mult}x"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("update").start()
      // chunked adds → several micro-batches, like a real ingest
      rows.grouped(math.max(1, rows.size / 8)).foreach { chunk =>
        ms.addData(chunk: _*)
        q.processAllAvailable()
      }
      val prog = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).get
      val so = prog.stateOperators.head
      println(s"STATE ${mult}x rows=${rows.size} " +
        s"stateRows=${so.numRowsTotal} stateBytes=${so.memoryUsedBytes} " +
        s"batches=${prog.batchId + 1}")
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $sink")
    }
    spark.stop()
  }
}
