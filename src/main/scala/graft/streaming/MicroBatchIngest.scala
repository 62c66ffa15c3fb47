package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Streaming ingestion (SURVEY S5 / §2.9).
  *
  * The reference consumes RabbitMQ messages (prefetch 1) naming granule
  * files, processes each batch through the same dataflow as batch mode, and
  * acks/nacks for at-least-once delivery; duplicate appends are repaired
  * post-hoc (`sam_extract/main.py:670-801`, `writers/ZarrWriter.py:355-378`).
  *
  * Structured-Streaming shape: a file-manifest stream → `foreachBatch`
  * running the identical batch pipeline → idempotent partition-overwrite
  * sink (graft.sinks.ProductStore). Idempotent sink + checkpointed source =
  * exactly-once effect over at-least-once delivery, replacing the reference's
  * ack/repair protocol. Completeness gating (the reference's day-gap logic,
  * `tools/deploy/run.py:217-333`) stays a driver-side manifest filter, as in
  * the reference.
  */
object MicroBatchIngest {

  /** Wrap a batch transform into a foreachBatch writer with an idempotent
    * sink. `Trigger.AvailableNow` drains pending input then stops — the
    * micro-batch analog of the reference's one-message-at-a-time loop. */
  def ingest(
      stream: DataFrame,
      transform: DataFrame => DataFrame,
      sink: DataFrame => Unit,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val out = transform(batch)
        sink(out)
      }

  /** Watermarked tumbling-window aggregate over an event-time stream —
    * the reference's implicit daily-granule windowing made explicit
    * (SURVEY §2.9 "Windows"). */
  def windowedMeans(
      stream: DataFrame,
      tsCol: String,
      valueCol: String,
      window_ : String = "1 day",
      watermark: String = "1 day"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_).as("w"))
      .agg(
        avg(col(valueCol)).as("mean_value"),
        count(col(valueCol)).as("n"))
      .select(col("w.start").as("window_start"), col("mean_value"), col("n"))
}
