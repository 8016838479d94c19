"""Structured-Streaming surface of the engine.

The reference is batch-only (SURVEY §2.6), but the production shape of
this job is incremental: new crawl partitions arrive continuously. Two
streaming capabilities are provided:

- ``stream_extract``: the SAME shuffle-free extraction kernel bound to
  ``readStream`` -> ``writeStream``; exactly-once via the streaming
  file-source commit log + sink checkpoint (complements the batch
  ``CheckpointedExtraction`` ledger). ``availableNow`` drains the
  backlog and stops — the cron-style incremental run.
- ``stream_event_window_counts``: watermarked tumbling-window
  aggregation over the events stream (late data handled by watermark
  eviction), the standard streaming-agg skeleton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from parsee_pdf_reader_spark.pipeline import extract_pages

PAGES_DDL = ("url string, warc_ts timestamp, html binary, text string, "
             "lang string")


def stream_extract(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str, available_now: bool = True):
    """Incremental extraction over a growing parquet directory."""
    src = (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", "16")
        .parquet(input_dir)
    )
    out = extract_pages(src)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_event_window_counts(events: DataFrame,
                               watermark: str = "30 minutes",
                               window: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window counts per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
    )


def run_stream_event_counts(spark: SparkSession, input_dir: str,
                            output_dir: str, checkpoint_dir: str):
    src = (
        spark.readStream
        .schema("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")
        .parquet(input_dir)
    )
    agg = stream_event_window_counts(src)
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_exact(docs: DataFrame,
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: first occurrence of each content hash
    passes, replays are dropped. ``dropDuplicatesWithinWatermark``
    dedups on the KEY alone (same hash at a different event time is
    still a duplicate) while the watermark still bounds state — keys
    older than the watermark are evicted, so memory is
    O(distinct keys per watermark window), not O(corpus). This is the
    streaming twin of the batch ``dedup_exact`` operator (the batch
    job dedups the historical corpus once; the stream keeps NEW
    arrivals deduped incrementally)."""
    hashed = docs.withColumn("content_hash", F.md5("text"))
    return (
        hashed.withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def run_stream_dedup(spark: SparkSession, input_dir: str,
                     output_dir: str, checkpoint_dir: str):
    """availableNow drain of the dedup stream over a parquet dir."""
    src = (
        spark.readStream
        .schema("doc_id long, ingest_ts timestamp, text string, "
                "lang string")
        .option("maxFilesPerTrigger", "4")
        .parquet(input_dir)
    )
    out = stream_dedup_exact(src)
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_neardup(docs: DataFrame,
                         watermark: str = "1 hour",
                         window: str = "5 minutes") -> DataFrame:
    """Streaming MinHash near-dup filter (VERDICT r3 item 8) — the
    incremental twin of the batch ``dedup_minhash_lsh`` candidates:

    1. each doc explodes into its ``_BANDS`` LSH band hashes (the
       exact arithmetic of ``operators.dedup.minhash_band_hashes``);
    2. ``dropDuplicatesWithinWatermark`` on (band, band_hash) keeps
       only the FIRST claimant of every band bucket — state is
       O(band buckets per watermark window), evicted as the watermark
       advances, never O(corpus);
    3. a doc survives iff it kept ALL of its bands (a later near-dup
       shares >=1 band with an earlier doc by the LSH property, loses
       that bucket, and drops out); the reassembly is a watermarked
       tumbling-window count==_BANDS, so the sink sees append-mode
       finalized windows only.

    Known conservative edge: two near-dups inside the SAME micro-batch
    can split band ownership between them and BOTH drop (cross-batch
    arrivals are deterministic first-wins). Exact same-batch dups are
    safe — one doc claims every bucket. Production would back stage 3
    with update-mode to a keyed sink; the file-sink path here finalizes
    per window.
    """
    from parsee_pdf_reader_spark.operators.dedup import (
        _BANDS, minhash_band_hashes,
    )

    banded = docs.select(
        "doc_id", "ingest_ts", "text",
        F.explode(minhash_band_hashes("text")).alias("bh"),
    ).select("doc_id", "ingest_ts", "text",
             F.col("bh.b").alias("b"),
             F.col("bh.band_hash").alias("band_hash"))
    kept = (
        banded.withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["b", "band_hash"])
    )
    return (
        kept.groupBy(F.window("ingest_ts", window).alias("w"),
                     "doc_id", "text")
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .where(F.col("n_bands") == _BANDS)
        .select(F.col("w.start").alias("window_start"), "doc_id", "text")
    )


def run_stream_neardup(spark: SparkSession, input_dir: str,
                       output_dir: str, checkpoint_dir: str,
                       max_files_per_trigger: int = 4):
    """availableNow drain of the near-dup stream over a parquet dir.
    Append mode: a window's survivors land once the watermark passes
    its end (late data earlier than the watermark is ignored by
    design). ``max_files_per_trigger`` sets the micro-batch grain —
    files grouped into one trigger contend under the same-batch edge
    documented on ``stream_dedup_neardup``."""
    src = (
        spark.readStream
        .schema("doc_id long, ingest_ts timestamp, text string, "
                "lang string")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    out = stream_dedup_neardup(src)
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
