"""Structured Streaming form of the reference's queue/JMS pipelines.

The reference's continuous modes (SURVEY.md §2.8):
  Q1 producer/consumer over a BlockingQueue with poison-pill shutdown
     (…/crawler/social/currency/ProducerConsumer.java:16-81)
  Q2 JMS durable topic subscription triggering crawl batches
     (…/crawler/social/jms/JMSConsumer.java:41-100)

Spark mapping: a file/rate/kafka readStream of work items →
foreachBatch(crawl batch) with trigger=availableNow. The poison pill
becomes stream end; the durable subscription becomes checkpointed
offsets. The batch-iterative CrawlEngine covers the north rule; this
module provides the streaming trigger wrapper around the same stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WORK_ITEM_SCHEMA = "biz string, mid string, idx string, sn string, date_str string"


def read_work_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of JSON work items (the JMS MapMessage analog:
    {date_str, partition_source} fields per JMSProducer.java:96-99)."""
    return spark.readStream.schema(WORK_ITEM_SCHEMA).json(path)


def run_work_stream(
    work: DataFrame,
    process_batch,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """foreachBatch wrapper with durable checkpointing (Q2 semantics:
    resumes from committed offsets like a durable subscriber)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # poison-pill analog: Product(idx=-1) rows terminate the reference
        # consumers (Producer.java:50-60); in streaming they're just filtered
        process_batch(batch_df.filter(F.col("idx") != "-1"), batch_id)

    writer = (
        work.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed aggregation with late-data watermarking —
    the engine-side upgrade the reference's queue pipeline lacks
    (it has no event-time semantics at all)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


def streaming_exact_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup over a document stream: first arrival of each
    normalized-text fingerprint wins, later copies are dropped.

    State is keyed by the 64-bit fingerprint only (not the text) and is
    evicted once the watermark passes (dropDuplicatesWithinWatermark), so
    the dedup state is O(distinct fingerprints per watermark window) — the
    property that lets this run forever on a 100 TB/day feed, unlike an
    unbounded dropDuplicates."""
    from dmp_crawler_spark.functions.textstats import doc_fingerprint

    return (
        docs.withColumn("fingerprint", doc_fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
