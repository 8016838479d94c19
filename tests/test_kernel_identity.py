"""Byte-identity: kernel output == reference engine output.

This is the correctness gate of BASELINE.json (north_rule: "matching
the reference's extracted text/spans per document (byte-identical
extracted text per url)"). The reference itself runs under tests/refshim
on the same PLD1 bytes.
"""

import pytest

from parsee_pdf_reader_spark.kernel.engine import extract_document
from parsee_pdf_reader_spark.sources.synth import build_document


def _compare_doc(key, blob, reference):
    import refadapter

    try:
        ref = refadapter.reference_extract_document(blob)
        ref_err = None
    except Exception as e:
        ref_err = type(e).__name__
    try:
        mine = extract_document(blob)
        my_err = None
    except Exception as e:
        my_err = type(e).__name__
    assert (ref_err is None) == (my_err is None), (
        f"{key}: error divergence mine={my_err} ref={ref_err}")
    if ref_err is not None:
        return
    assert len(mine) == len(ref)
    for m, r in zip(mine, ref):
        pi = r["page_index"]
        assert m["extracted_text"] == r["extracted_text"], \
            f"{key} p{pi}: extracted_text"
        assert m["n_elements"] == r["n_elements"], f"{key} p{pi}: elements"
        assert m["paragraphs"] == r["paragraphs"], f"{key} p{pi}: paragraphs"
        assert m["tables"] == r["tables"], f"{key} p{pi}: tables"


@pytest.mark.parametrize("seed", [42, 7])
def test_kernel_matches_reference_synthetic(reference, seed):
    for i in range(40):
        key = f"doc{i}"
        blob, _ = build_document(key, seed)
        _compare_doc(f"{key}@{seed}", blob, reference)


def test_kernel_matches_reference_real_text(reference):
    import duckdb

    rows = duckdb.sql(
        "select doc_id, text from "
        "'/root/testdata/sf0.001/documents.parquet' limit 60"
    ).fetchall()
    for doc_id, text in rows:
        key = f"doc{doc_id}"
        blob, _ = build_document(key, 42, text)
        _compare_doc(key, blob, reference)


def test_tables_detected_at_all(reference):
    """Guard against vacuous identity (both sides finding nothing)."""
    n_tables = 0
    for i in range(40):
        blob, _ = build_document(f"doc{i}", 42)
        for pg in extract_document(blob):
            n_tables += len(pg["tables"])
    assert n_tables >= 10
