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


def test_stateful_session_tracking(spark, tmp_path):
    """applyInPandasWithState: sessions close on gap; counts correct."""
    import pandas as pd

    from parsee_pdf_reader_spark.streaming.stateful import (
        run_stream_user_sessions,
    )

    inp = str(tmp_path / "ev_in")
    outp = str(tmp_path / "sess_out")
    ck = str(tmp_path / "ck3")
    base = pd.Timestamp("2025-06-01 10:00:00")
    rows = []
    # user 1: two sessions split by a 2h gap; user 2: one session
    for i, off in enumerate([0, 60, 120, 7800, 7860]):
        rows.append((i, (base + pd.Timedelta(seconds=off))
                     .to_pydatetime(), 1, "click", 1.0, ""))
    for i, off in enumerate([0, 300, 600]):
        rows.append((100 + i, (base + pd.Timedelta(seconds=off))
                     .to_pydatetime(), 2, "view", 1.0, ""))
    # closers far in the future flush the open sessions in-batch
    rows.append((999, (base + pd.Timedelta(days=2)).to_pydatetime(), 1,
                 "click", 1.0, ""))
    rows.append((998, (base + pd.Timedelta(days=2)).to_pydatetime(), 2,
                 "view", 1.0, ""))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.coalesce(1).write.parquet(inp)

    q = run_stream_user_sessions(spark, inp, outp, ck)
    q.awaitTermination(240)
    out = spark.read.parquet(outp).collect()
    sess = {}
    for r in out:
        sess.setdefault(r.user_id, []).append(r.n_events)
    assert sorted(sess[1]) == [2, 3]   # 3-event + 2-event closed sessions
    assert sess[2] == [3]


def test_stream_dedup_exact(spark, tmp_path):
    """Two micro-batches; batch 2 replays a batch-1 document (same
    text, later ingest_ts) and adds a new one — the replay must be
    dropped, the new doc kept."""
    import os

    import pandas as pd

    from parsee_pdf_reader_spark.streaming.incremental import (
        run_stream_dedup,
    )

    inp = os.path.join(str(tmp_path), "docs_stream")
    outp = os.path.join(str(tmp_path), "deduped")
    ck = os.path.join(str(tmp_path), "ck")
    os.makedirs(inp)
    import datetime

    t0 = datetime.datetime(2025, 6, 1, 10, 0, 0)

    def mins(m):
        return t0 + datetime.timedelta(minutes=m)

    b1 = [(1, t0, "alpha body text", "en"),
          (2, mins(1), "beta body text", "en")]
    b2 = [(3, mins(2), "alpha body text", "en"),
          (4, mins(3), "gamma body text", "en")]
    schema = ("doc_id long, ingest_ts timestamp, text string, "
              "lang string")
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(inp)
    spark.createDataFrame(b2, schema).coalesce(1) \
        .write.mode("append").parquet(inp)

    q = run_stream_dedup(spark, inp, outp, ck)
    q.awaitTermination(120)
    got = spark.read.parquet(outp)
    kept_texts = {r.text for r in got.collect()}
    assert "gamma body text" in kept_texts
    assert "beta body text" in kept_texts
    # exactly one copy of the replayed content survived
    assert got.where("text = 'alpha body text'").count() == 1
    assert got.count() == 3


def test_stream_dedup_neardup(spark, tmp_path):
    """VERDICT r3 item 8: streaming MinHash near-dup. Batch 2 carries
    a NEAR-duplicate of a batch-1 doc (one trailing word changed —
    shares exactly 1 of 3 LSH bands, verified by the same md5
    arithmetic) plus a genuinely new doc; the near-dup must drop, the
    new doc survive. A far-future sentinel batch pushes the watermark
    so the append-mode windows finalize into the file sink."""
    import datetime
    import os

    from parsee_pdf_reader_spark.streaming.incremental import (
        run_stream_neardup,
    )

    inp = os.path.join(str(tmp_path), "docs_stream")
    outp = os.path.join(str(tmp_path), "neardup")
    ck = os.path.join(str(tmp_path), "ck")
    os.makedirs(inp)
    t0 = datetime.datetime(2025, 6, 1, 10, 0, 0)

    def mins(m):
        return t0 + datetime.timedelta(minutes=m)

    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank today")
    near = ("the quick brown fox jumps over the lazy dog near the "
            "river bank tonight")
    other = ("completely different content about quarterly revenue "
             "and operating expenses growth")
    fresh = ("annual shareholder meeting scheduled for june with "
             "board election and audit review")
    schema = ("doc_id long, ingest_ts timestamp, text string, "
              "lang string")
    b1 = [(1, t0, base, "en"), (2, mins(1), other, "en")]
    b2 = [(3, mins(2), near, "en"), (4, mins(3), fresh, "en")]
    # sentinel 3h later: watermark (1h) passes the 5-min windows above
    b3 = [(99, t0 + datetime.timedelta(hours=3), "late sentinel", "en")]
    for batch in (b1, b2, b3):
        spark.createDataFrame(batch, schema).coalesce(1) \
            .write.mode("append").parquet(inp)

    # one file per micro-batch: batches must arrive in order for the
    # cross-batch first-wins semantics to be the thing under test
    q = run_stream_neardup(spark, inp, outp, ck,
                           max_files_per_trigger=1)
    q.awaitTermination(180)
    got = spark.read.parquet(outp)
    kept = {r.doc_id for r in got.collect()}
    assert 1 in kept and 2 in kept and 4 in kept, kept
    assert 3 not in kept, kept       # cross-batch near-dup dropped
    assert 99 not in kept, kept      # sentinel window still open


def test_stream_neardup_rejoin_single_query(spark, tmp_path):
    """Round-6: the slim near-dup stream chained into the stream-stream
    payload rejoin in ONE append-mode query (claim agg -> reassembly
    agg -> time-interval join). Survivors land in the sink with their
    original text recovered from the raw stream; the near-dup and the
    open sentinel window stay out. A replayed doc_id in a later
    window must rejoin THAT window's arrival, not the first one."""
    import datetime

    from parsee_pdf_reader_spark.streaming.incremental import (
        run_stream_neardup_rejoined,
    )

    inp = os.path.join(str(tmp_path), "docs_stream")
    outp = os.path.join(str(tmp_path), "rejoined")
    ck = os.path.join(str(tmp_path), "ck")
    os.makedirs(inp)
    t0 = datetime.datetime(2025, 6, 1, 10, 0, 0)

    def mins(m):
        return t0 + datetime.timedelta(minutes=m)

    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank today")
    near = ("the quick brown fox jumps over the lazy dog near the "
            "river bank tonight")
    other = ("completely different content about quarterly revenue "
             "and operating expenses growth")
    schema = ("doc_id long, ingest_ts timestamp, text string, "
              "lang string")
    b1 = [(1, t0, base, "en"), (2, mins(1), other, "en")]
    # 3 = cross-batch near-dup of 1 (same window): must drop.
    # 7 = doc 1's text REPLAYED in the next 5-min window: re-claims
    # there and must rejoin its own window's arrival.
    # doc 2 RETRIED inside its own window: the raw-side in-window
    # dedup must keep the sink at exactly one row for it
    b2 = [(3, mins(2), near, "en"), (7, mins(7), base, "en"),
          (2, mins(3), other, "en")]
    b3 = [(99, t0 + datetime.timedelta(hours=3), "late sentinel",
           "en")]
    for batch in (b1, b2, b3):
        spark.createDataFrame(batch, schema).coalesce(1) \
            .write.mode("append").parquet(inp)

    q = run_stream_neardup_rejoined(spark, inp, outp, ck,
                                    max_files_per_trigger=1)
    q.awaitTermination(180)
    allrows = spark.read.parquet(outp).collect()
    got = {r.doc_id: r for r in allrows}
    assert len(allrows) == len(got) == 3, allrows  # no duplicate rows
    assert set(got) == {1, 2, 7}, set(got)
    assert got[1].text == base and got[2].text == other
    # the replay's survivor row carries its OWN window + payload
    assert got[7].text == base
    assert got[7].window_start == mins(5)
    assert got[1].window_start == t0
