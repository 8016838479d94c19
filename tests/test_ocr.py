"""OCR repair branch: recorded-engine byte-identity vs the reference's
raw-char path, trigger behavior, and gating of native engines."""

import pytest

from parsee_pdf_reader_spark.kernel.engine import extract_document
from parsee_pdf_reader_spark.sources import layout_codec as codec
from parsee_pdf_reader_spark.sources.ocr import (
    RecordedOcrEngine,
    TesseractOcrEngine,
    tesseract_available,
)


def _cid_page():
    """A page whose glyphs are unreadable -> needs_ocr fires."""
    chars = [codec.Char(10 + 30 * i, 35 + 30 * i, 700, 710, 10.0, False,
                        f"(cid:{i})") for i in range(4)]
    return codec.Page((0, 0, 612, 792), None,
                      [codec.Box(codec.KIND_TEXTBOX, lines=[chars])])


def _recording():
    """Tesseract-style word boxes for a 1000x1400 raster, including one
    low-confidence word that the crop-rescan pass corrected."""
    words = ["Total", "revenues", "1,234", "(56)", "net", "income", "789"]
    conf = [95, 91, 88, 40, 93, 92, 96]
    rescan = ["Total", "revenues", "1,234", "(506)", "net", "income",
              "789"]
    lefts = [100 + 140 * (i % 4) for i in range(len(words))]
    tops = [200 + 60 * (i // 4) for i in range(len(words))]
    return {
        "conf": conf + [-1],
        "left": lefts + [0],
        "top": tops + [0],
        "width": [90] * len(words) + [5],
        "height": [30] * len(words) + [5],
        "text": words + ["noise"],
        "text_rescanned": rescan + ["noise"],
    }


def test_ocr_engine_replaces_unreadable_page(reference):
    import refshim
    from pdf_reader.custom_dataclasses import (
        NaturalTextHelper,
        PdfReaderConfig,
    )
    from pdf_reader.extract import make_paragraphs
    from pdf_reader.pdf_page import ParseePdfPage

    blob = codec.encode_document([_cid_page()])
    engine = RecordedOcrEngine({0: _recording()}, {0: (1000, 1400)})
    out = extract_document(blob, ocr_engine=engine)
    assert len(out) == 1
    pg = out[0]
    assert pg["ocr_applied"] and not pg["needs_ocr"]
    assert "Total" in pg["extracted_text"]
    assert "(506)" in pg["extracted_text"]  # rescanned low-conf word

    # byte-identity of the OCR branch: feed the reference the same
    # converted char stream (its raw-LTChar path, pdf_page.py:209-273)
    _mb, chars = engine(None, 0)
    lt_chars = [refshim.FakeLTChar(c.x0, c.x1, c.y0, c.y1, c.text, c.size)
                for c in chars]
    p = ParseePdfPage(0, "", (0, 0, 1000, 1400), lt_chars,
                      PdfReaderConfig(None, None, None),
                      NaturalTextHelper(None))
    elements = p.extract_text_and_tables()
    paragraphs = make_paragraphs(elements, PdfReaderConfig(20, 10, 6),
                                 None, None, p.page_size.width())
    ref_text = "\n\n".join(t for t in (el.get_text() for el in paragraphs)
                           if t)
    assert pg["extracted_text"] == ref_text


def test_ocr_not_applied_to_readable_pages():
    from parsee_pdf_reader_spark.sources.synth import build_document

    blob, _ = build_document("doc0", 42)
    sentinel_calls = []

    def engine(page, page_index):
        sentinel_calls.append(page_index)
        return None

    out = extract_document(blob, ocr_engine=engine)
    assert sentinel_calls == []  # no page triggered OCR
    assert all(not pg["needs_ocr"] for pg in out)


def test_force_ocr_runs_engine_on_every_page():
    from parsee_pdf_reader_spark.sources.synth import build_document

    blob, _ = build_document("doc0", 42)
    calls = []

    def engine(page, page_index):
        calls.append(page_index)
        return None  # engine declines -> native layout kept

    out = extract_document(blob, ocr_engine=engine, force_ocr=True)
    assert calls == list(range(len(out)))


def test_tesseract_engine_is_gated():
    if tesseract_available():
        pytest.skip("tesseract present; gate not applicable")
    with pytest.raises(NotImplementedError):
        TesseractOcrEngine()


def test_pdf_source_is_gated():
    from parsee_pdf_reader_spark.sources.pdf_source import (
        parse_pdf_bytes,
        pdf_available,
    )

    assert not pdf_available()  # fake shim modules must not count
    assert parse_pdf_bytes(b"%PDF-1.4 ...") is None
