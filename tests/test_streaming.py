"""Structured-Streaming: incremental extraction + watermarked windows."""

import os

from parsee_pdf_reader_spark.sources.synth import synthesize_pages_df
from parsee_pdf_reader_spark.streaming.incremental import (
    run_stream_event_counts,
    stream_extract,
)

SF = "/root/testdata/sf0.001"


def test_stream_extract_incremental(spark, tmp_path):
    inp = str(tmp_path / "pages_stream")
    outp = str(tmp_path / "extracted_stream")
    ck = str(tmp_path / "ck")

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    batch1 = synthesize_pages_df(spark, docs.where("doc_id < 15"))
    batch1.write.mode("append").parquet(inp)

    q = stream_extract(spark, inp, outp, ck)
    q.awaitTermination(180)
    n1 = spark.read.parquet(outp).count()
    assert n1 >= 15

    # new files arrive -> only the delta is processed on resume
    batch2 = synthesize_pages_df(
        spark, docs.where("doc_id >= 15 and doc_id < 25"))
    batch2.write.mode("append").parquet(inp)
    q2 = stream_extract(spark, inp, outp, ck)
    q2.awaitTermination(180)
    out = spark.read.parquet(outp)
    n2 = out.count()
    assert n2 > n1
    # exactly-once: no duplicated urls per page
    assert out.select("url", "page_index").distinct().count() == n2


def test_stream_event_window_counts(spark, tmp_path):
    inp = str(tmp_path / "events_stream")
    outp = str(tmp_path / "win_out")
    ck = str(tmp_path / "ck2")
    spark.read.parquet(f"{SF}/events.parquet").write.parquet(inp)
    q = run_stream_event_counts(spark, inp, outp, ck)
    q.awaitTermination(180)
    out = spark.read.parquet(outp)
    rows = out.collect()
    assert len(rows) > 0
    assert {"window_start", "window_end", "event_type", "n_events",
            "sum_value"} <= set(out.columns)
    assert all(r.n_events > 0 for r in rows)
