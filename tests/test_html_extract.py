"""HTML main-content extraction: boilerplate strip, dispatch, Spark map."""

from pyspark.sql import functions as F

from parsee_pdf_reader_spark.operators.html_extract import (
    extract_html_document,
    extract_web_pages,
    looks_like_html,
    sniff_kind_col,
)
from parsee_pdf_reader_spark.sources.synth import (
    build_document,
    build_html_document,
)


def test_main_text_matches_golden():
    n_dropped = 0
    for i in range(40):
        blob, golden = build_html_document(f"web{i}", 42)
        d = extract_html_document(blob)
        assert d["main_text"] == golden, f"web{i}"
        assert d["title"]
        assert d["n_kept"] <= d["n_blocks"]
        n_dropped += d["n_blocks"] - d["n_kept"]
    assert n_dropped > 0  # link-heavy blocks were dropped somewhere


def test_boilerplate_is_dropped():
    blob, _ = build_html_document("web1", 42)
    d = extract_html_document(blob)
    t = d["main_text"].lower()
    assert "advertisement" not in t
    assert "copyright" not in t
    assert "not content" not in t  # script payload
    assert "margin:0" not in t     # style payload


def test_looks_like_html():
    assert looks_like_html(b"  <!DOCTYPE html><html>...")
    assert looks_like_html(b"<html lang='en'>")
    assert not looks_like_html(b"PLD1xxxx")
    assert not looks_like_html(b"%PDF-1.4")


def test_dispatch_and_web_extraction(spark):
    rows = []
    golden = {}
    for i in range(10):
        blob, g = build_html_document(f"web{i}", 42)
        golden[f"h{i}"] = g
        rows.append((f"h{i}", None, blob, g, "en"))
    for i in range(5):
        blob, text = build_document(f"doc{i}", 42)
        rows.append((f"l{i}", None, blob, text, "en"))
    rows.append(("junk", None, b"\x00\x01garbage", "", "en"))
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string")
    kinds = {r.url: r.kind
             for r in df.select("url", sniff_kind_col().alias("kind"))
             .collect()}
    assert all(kinds[f"h{i}"] == "html" for i in range(10))
    assert all(kinds[f"l{i}"] == "layout" for i in range(5))
    assert kinds["junk"] == "unknown"

    web = extract_web_pages(df.where(sniff_kind_col() == "html")).collect()
    assert len(web) == 10
    for r in web:
        assert r.error is None
        assert r.main_text == golden[r.url]

    # plan: dispatch filter + map, no shuffle
    plan = extract_web_pages(df.where(sniff_kind_col() == "html")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
