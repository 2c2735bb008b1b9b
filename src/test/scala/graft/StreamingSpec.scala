package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Structured Streaming semantics driven to completion with a memory
  * sink (AvailableNow-style: processAllAvailable over the static
  * parquet), compared against the batch twins. */
class StreamingSpec extends SparkSpecBase {

  /** The file stream source needs a directory; stage the single
    * events.parquet into one. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame,
                          name: String,
                          mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("streaming tumbling counts match the batch q41") {
    val streamed = runToMemory(
      Streams.tumblingCounts(Streams.eventsStream(spark, eventsDir)),
      "t_tumbling", mode = "append")
    // watermark "1 hour": every window closes except the tail; compare
    // against batch on the windows the stream emitted
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
    val joined = streamed.alias("s").join(batch.alias("b"),
      Seq("win_start", "event_type"))
    assert(streamed.count() > 0)
    assert(joined.filter(col("s.n") =!= col("b.n")).isEmpty)
  }

  test("dropDuplicatesWithinWatermark dedups replayed events") {
    val replayed = Streams.eventsStream(spark, eventsDir)
      .unionByName(Streams.eventsStream(spark, eventsDir))
    val deduped = runToMemory(
      Streams.dedupWithinWatermark(replayed), "t_dedup")
    val expected = Tables.events(spark, sf).select("event_id").distinct().count()
    assert(deduped.count() == expected)
  }

  test("flatMapGroupsWithState running totals end at the batch totals") {
    val streamed = runToMemory(
      Streams.runningUserTotals(spark, Streams.eventsStream(spark, eventsDir)),
      "t_state", mode = "append")
    // final state per user = last emitted row per user (one batch → one row)
    val finalRows = streamed.groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"))
    val batch = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    assert(finalRows.exceptAll(batch).isEmpty)
  }

  test("streaming session windows produce the q43 session starts") {
    val streamed = runToMemory(
      Streams.sessionCounts(Streams.eventsStream(spark, eventsDir)), "t_sessions")
    val batch = Queries.byName("q43_session_windows").run(spark, sf)
      .select(col("user_id"), col("session_start"), col("n_events"))
    val joined = streamed.join(batch, Seq("user_id", "session_start"))
    assert(streamed.count() > 0)
    assert(joined.count() == streamed.count())
  }
}
