package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.core.FlatTable

/** Structured-Streaming layer (SURVEY.md §7 M5 extension): windowed
  * aggregation with watermarks feeding the same tabulation operators, either
  * incrementally (append/update modes) or via `foreachBatch` re-tabulation
  * when margins must stay globally consistent within each emitted batch.
  */
object Streaming {

  /** Tumbling/sliding windowed aggregation with a watermark for state
    * cleanup and late-data handling. */
  def windowedAgg(events: DataFrame, tsCol: String, watermark: String,
                  win: String, slide: Option[String] = None,
                  keys: Seq[String] = Nil, aggs: Seq[Column] = Seq(count(lit(1)).as("n"))
                 ): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(tsCol), win, s)
      case None    => window(col(tsCol), win)
    }
    events.withWatermark(tsCol, watermark)
      .groupBy((w.as("window") +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Per-batch tabulation: run the (margin-producing) tabulation pipeline on
    * every micro-batch output. Margins over an unbounded stream are only
    * consistent within a batch snapshot, so `foreachBatch` is the correct
    * place to compute them — state stays in the upstream windowed agg, and the
    * tabulation layer re-runs on the (small) aggregated result.
    */
  def tabulateForeachBatch(aggregated: DataFrame,
                           tabulate: DataFrame => FlatTable,
                           onBatch: (FlatTable, Long) => Unit,
                           trigger: Trigger = Trigger.AvailableNow()
                          ): DataStreamWriter[Row] =
    aggregated.writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) onBatch(tabulate(batch), id)
        ()
      }

  /** Convenience: run a windowed count stream into an in-memory table (used
    * by tests and notebook smoke checks). */
  def toMemorySink(df: DataFrame, name: String, outputMode: String = "complete"
                  ): StreamingQuery =
    df.writeStream.outputMode(outputMode).format("memory").queryName(name).start()
}
