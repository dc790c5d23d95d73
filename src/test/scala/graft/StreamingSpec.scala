package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.FlatTable
import graft.streaming.Streaming

case class Ev(ts: Timestamp, event_type: String, value: Double)

/** Structured-Streaming tabulation: the streaming windowed aggregation must
  * agree with the equivalent batch computation, and foreachBatch must deliver
  * tabulated (margin-bearing) FlatTables per micro-batch.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def eventRows(n: Int): Seq[Ev] = {
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("event_type"), col("value")).limit(n).collect()
    batch.map(r => Ev(r.getTimestamp(0), r.getString(1), r.getDouble(2))).toSeq
  }

  test("streaming tumbling-window counts equal the batch computation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows(500)
    val stream = MemoryStream[Ev]
    stream.addData(rows)
    val agg = Streaming.windowedAgg(stream.toDF(), "ts", watermark = "1 hour",
      win = "1 hour", keys = Seq("event_type"))
    val q = Streaming.toMemorySink(agg, "stream_counts")
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_counts")
        .select(col("window.start").as("w"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = rows.toDF()
        .groupBy(window(col("ts"), "1 hour").as("window"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("foreachBatch re-tabulates each micro-batch with margins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(eventRows(300))
    val agg = Streaming.windowedAgg(stream.toDF(), "ts", watermark = "1 hour",
      win = "6 hours", keys = Seq("event_type"))
    @volatile var captured: Option[Array[org.apache.spark.sql.Row]] = None
    val writer = Streaming.tabulateForeachBatch(
      agg.select(col("event_type"), col("n")),
      batch => FlatTable(batch, Seq("event_type"))
        .addTotals(graft.core.Axis.Rows),
      (ft, _) => captured = Some(ft.ordered.collect())
    )
    val q = writer.start()
    try {
      q.processAllAvailable()
      val rows = captured.get
      val tot = rows.last
      assert(tot.getString(0) == "Totals")
      assert(tot.getLong(1) == rows.dropRight(1).map(_.getLong(1)).sum)
    } finally q.stop()
  }
}
