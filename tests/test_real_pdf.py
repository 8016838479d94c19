"""The reference's OWN fixture PDFs, end to end.

Ports /root/reference/tests/integration_tests.py:4-31 against the
pure-stdlib decoder (sources/pdf_mini.py): the real files are parsed
from raw bytes (form10k: unencrypted, Type0/CIDFontType2 fonts with
EMPTY ToUnicode CMaps -> TrueType-cmap text recovery; bayer1: RC4-128
encrypted, xref+object streams, Type1 fonts), fed through the kernel,
and the extracted tables must match the reference's pinned golden
counts. Additionally every page's kernel output is verified
BYTE-IDENTICAL against the actual reference engine (tests/refshim) run
on the same decoded char stream.

q111_interimreport.pdf / allianz assertions are not portable: that file
is stripped from this snapshot (/root/reference/.MISSING_LARGE_BLOBS).
"""

import os

import pytest

import refadapter
from parsee_pdf_reader_spark.kernel.engine import extract_document
from parsee_pdf_reader_spark.sources import layout_codec as codec
from parsee_pdf_reader_spark.sources.pdf_mini import parse_pdf_mini

FILES = "/root/reference/tests/files"
FORM10K = os.path.join(FILES, "form10k20231230.pdf")
BAYER = os.path.join(FILES, "bayer1.pdf")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FORM10K), reason="reference fixtures unavailable")


def _extract(path, page_indices=None):
    blob = open(path, "rb").read()
    pages = parse_pdf_mini(blob)
    out = {}
    for i, pg in enumerate(pages):
        if page_indices is not None and i not in page_indices:
            continue
        rows = extract_document(codec.encode_document([pg]))
        out[i] = rows[0]
    return pages, out


def test_form10k_golden_counts():
    """integration_tests.py:4-9 — page 1: exactly 1 table, 2 cols,
    47 rows."""
    pages, out = _extract(FORM10K)
    assert len(pages) == 1
    tables = out[0]["tables"]
    assert len(tables) == 1
    assert tables[0]["num_cols"] == 2
    assert tables[0]["num_rows"] == 47
    # the Quartz subset fonts decode to real text, not (cid:) glyphs
    assert "CONSOLIDATED BALANCE SHEETS" in out[0]["extracted_text"]


def test_bayer_golden_counts():
    """integration_tests.py:12-31 — 50 pages; page 3: 1 table 7 cols
    36-37 rows; page 6: 2 tables 8 cols (10-12 and 9-10 rows); page 9:
    >=1 table with 8 cols and 22-24 rows."""
    pages, out = _extract(BAYER, page_indices={2, 5, 8})
    assert len(pages) == 50
    t3 = out[2]["tables"]
    assert len(t3) == 1
    assert t3[0]["num_cols"] == 7
    assert 36 <= t3[0]["num_rows"] <= 37
    t6 = out[5]["tables"]
    assert len(t6) == 2
    assert all(t["num_cols"] == 8 for t in t6)
    assert 10 <= t6[0]["num_rows"] <= 12
    assert 9 <= t6[1]["num_rows"] <= 10
    t9 = out[8]["tables"]
    assert len(t9) >= 1
    assert any(t["num_cols"] == 8 and 22 <= t["num_rows"] <= 24
               for t in t9)


@pytest.mark.parametrize("path", [FORM10K, BAYER])
def test_real_pdf_byte_identity_vs_reference(path):
    """Every page of both fixtures: kernel output byte-identical to the
    ACTUAL reference engine run on the same decoded char stream."""
    blob = open(path, "rb").read()
    pages = parse_pdf_mini(blob)
    kernel_rows = extract_document(codec.encode_document(pages))
    ref_rows = refadapter.reference_extract_document(
        codec.encode_document(pages))
    assert len(kernel_rows) == len(ref_rows)
    for k, r in zip(kernel_rows, ref_rows):
        assert k["extracted_text"] == r["extracted_text"], \
            f"text diverges on page {k['page_index']} of {path}"
        kt = [(t["num_cols"], t["num_rows"]) for t in k["tables"]]
        rt = [(t["num_cols"], t["num_rows"]) for t in r["tables"]]
        assert kt == rt, f"tables diverge on page {k['page_index']}"


def test_truncated_and_corrupt_pdfs_degrade_cleanly():
    """A 10^12-row corpus contains truncated and bit-rotted members;
    the decoder must never hang or crash the kernel — heavy truncation
    yields 0 pages (the pipeline marks the url as an EmptyDocument
    error row), partial data yields whatever pages parse."""
    import random

    data = open(FORM10K, "rb").read()
    for cut in (10, 100, 1000, 5000, 50000, 150000):
        rows_or_empty = extract_document(data[:cut])
        assert isinstance(rows_or_empty, list)
    rng = random.Random(7)
    for _ in range(3):
        b = bytearray(data)
        for _k in range(200):
            b[rng.randrange(len(b))] = rng.randrange(256)
        out = extract_document(bytes(b))
        assert isinstance(out, list)


def test_synthetic_pdf_fuzz_identity():
    """Deterministic synthetic REAL PDFs (synth.build_pdf_document:
    classic xref, uncompressed streams, built-in Helvetica) widen the
    %PDF fuzz surface beyond the two fixture files: every document
    must extract byte-identically kernel-vs-reference, and the corpus
    must actually contain tables (non-vacuous)."""
    from parsee_pdf_reader_spark.sources.synth import build_pdf_document

    total_tables = 0
    for i in range(40):
        blob = build_pdf_document(f"p{i}", 42)
        pages = parse_pdf_mini(blob)
        assert pages, f"p{i}: no pages decoded"
        enc = codec.encode_document(pages)
        mine = extract_document(enc)
        ref = refadapter.reference_extract_document(enc)
        for k, r in zip(mine, ref):
            assert k["extracted_text"] == r["extracted_text"], f"p{i}"
            kt = [(t["num_cols"], t["num_rows"]) for t in k["tables"]]
            rt = [(t["num_cols"], t["num_rows"]) for t in r["tables"]]
            assert kt == rt, f"p{i}"
            total_tables += len(kt)
    assert total_tables >= 20, total_tables


def test_pdf_magic_dispatch():
    """extract_document consumes raw %PDF bytes directly (content
    dispatch, no extension sniffing)."""
    rows = extract_document(open(FORM10K, "rb").read())
    assert len(rows) == 1
    assert rows[0]["tables"][0]["num_rows"] == 47


def test_synthetic_pdf_filter_variants_identity():
    """Every non-image stream filter pdf_mini decodes (Flate, LZW,
    RunLength, ASCIIHex, ASCII85): synth writes a variant per filter
    and each must extract byte-identically kernel-vs-reference
    (VERDICT r2 item 6)."""
    from parsee_pdf_reader_spark.sources.synth import (
        PDF_STREAM_FILTERS,
        build_pdf_document,
    )

    for filt in PDF_STREAM_FILTERS:
        content = 0
        for i in range(4):
            blob = build_pdf_document(f"f{filt}{i}", 42,
                                      stream_filter=filt)
            pages = parse_pdf_mini(blob)
            assert pages, f"{filt}/{i}: no pages"
            enc = codec.encode_document(pages)
            mine = extract_document(enc)
            ref = refadapter.reference_extract_document(enc)
            assert len(mine) == len(ref) > 0, f"{filt}/{i}"
            for k, r in zip(mine, ref):
                assert k["extracted_text"] == r["extracted_text"], \
                    f"{filt}/{i}"
                kt = [(t["num_cols"], t["num_rows"])
                      for t in k["tables"]]
                rt = [(t["num_cols"], t["num_rows"])
                      for t in r["tables"]]
                assert kt == rt, f"{filt}/{i}"
                content += len(kt) + len(k["extracted_text"])
        assert content > 0, f"{filt}: decoded nothing at all"


def test_synthetic_pdf_xref_stream_layout_identity():
    """Modern PDF 1.5 layout (compressed /XRef stream + /ObjStm
    holding every non-stream object): same extraction as the classic
    layout of the same document, byte-identical kernel-vs-reference."""
    from parsee_pdf_reader_spark.sources.synth import build_pdf_document

    for i in range(8):
        classic = build_pdf_document(f"xs{i}", 42, xref_kind="classic")
        modern = build_pdf_document(f"xs{i}", 42, xref_kind="stream")
        assert classic != modern
        p_c = parse_pdf_mini(classic)
        p_m = parse_pdf_mini(modern)
        rows_c = extract_document(codec.encode_document(p_c))
        rows_m = extract_document(codec.encode_document(p_m))
        assert [r["extracted_text"] for r in rows_c] == \
            [r["extracted_text"] for r in rows_m], f"xs{i}"
        ref = refadapter.reference_extract_document(
            codec.encode_document(p_m))
        for k, r in zip(rows_m, ref):
            assert k["extracted_text"] == r["extracted_text"], f"xs{i}"
