"""Structured Streaming surface (SURVEY §2.6).

The reference's search log is an append-only stream consumed
incrementally via a stored offset (``inverted_index.py:121-128`` — hand
rolled micro-batching). The batch-incremental equivalent lives in
``SearchEngine.aggregate_frequency``; this module exposes the same
aggregation as a real Structured Streaming job:

- :func:`stream_frequency_totals` — running per-token totals merged
  into a target table via ``foreachBatch`` (exactly-once per epoch with
  the stream checkpoint);
- :func:`stream_windowed_counts` — event-time 1-minute windows with a
  watermark (late-data handling), the canonical streaming-agg shape.

Both accept ``availableNow`` triggering so tests and backfills run
bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LOG_SCHEMA = "seq_id long, ts timestamp, token string, size int"


def read_log_stream(spark: SparkSession, log_dir: str) -> DataFrame:
    return (spark.readStream.schema(LOG_SCHEMA)
            .option("maxFilesPerTrigger", 64)
            .parquet(log_dir))


def stream_frequency_totals(spark: SparkSession, log_dir: str,
                            out_dir: str, checkpoint_dir: str,
                            available_now: bool = True):
    """Per-token running totals → parquet at ``out_dir``.

    Each micro-batch's partial counts are merged into the running table
    inside ``foreachBatch`` (read-modify-write of a small aggregate —
    the stream checkpoint makes the epoch idempotent, mirroring the
    reference's offset commit)."""
    stream = read_log_stream(spark, log_dir)
    totals = stream.groupBy("token").agg(F.sum("size").alias("freq"))

    def publish(batch_df: DataFrame, epoch_id: int) -> None:
        # complete-mode agg: each epoch delivers the FULL running totals
        # (streaming state lives in the checkpoint, surviving restarts)
        # → publish is a plain overwrite, idempotent per epoch
        tmp = out_dir + "_tmp"
        batch_df.write.mode("overwrite").parquet(tmp)
        batch_df.sparkSession.read.parquet(tmp).write.mode(
            "overwrite").parquet(out_dir)

    writer = (totals.writeStream.outputMode("complete")
              .foreachBatch(publish)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_counts(spark: SparkSession, log_dir: str,
                           checkpoint_dir: str,
                           window: str = "1 minute",
                           watermark: str = "2 minutes",
                           queryName: str = "konl_windowed_counts"):
    """Event-time windowed token counts with a watermark; results land
    in an in-memory sink table named ``queryName`` (append mode emits a
    window only once the watermark passes it — late rows beyond the
    watermark are dropped, the standard late-data contract)."""
    stream = read_log_stream(spark, log_dir)
    agg = (stream.withWatermark("ts", watermark)
           .groupBy(F.window("ts", window).alias("w"), F.col("token"))
           .agg(F.sum("size").alias("freq"))
           .select(F.col("w.start").alias("window_start"), "token", "freq"))
    return (agg.writeStream.outputMode("append")
            .format("memory").queryName(queryName)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
