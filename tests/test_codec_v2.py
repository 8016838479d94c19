"""PLD2 columnar codec: lossless roundtrip, PLD1 equivalence, and
extraction-output invariance (the corpus format must never change
what the kernel extracts)."""

from parsee_pdf_reader_spark.kernel.engine import extract_document
from parsee_pdf_reader_spark.sources import layout_codec as codec
from parsee_pdf_reader_spark.sources.synth import (
    build_document,
    build_stress_document,
)


def _pages_equal(a, b):
    assert len(a) == len(b)
    for pa, pb in zip(a, b):
        assert pa.mediabox == pb.mediabox
        assert pa.natural_text == pb.natural_text
        assert len(pa.boxes) == len(pb.boxes)
        for ba, bb in zip(pa.boxes, pb.boxes):
            assert ba.kind == bb.kind
            assert ba.rect == bb.rect
            assert len(ba.lines) == len(bb.lines)
            for la, lb in zip(ba.lines, bb.lines):
                assert len(la) == len(lb)
                for ca, cb in zip(la, lb):
                    for s in codec.Char.__slots__:
                        assert getattr(ca, s) == getattr(cb, s), s


def _blobs(n=40):
    for i in range(n):
        yield build_document(f"doc{i}", 42)[0]
        yield build_stress_document(f"s{i}", 42)


def test_v2_roundtrip_bit_identical_to_v1():
    for blob in _blobs():
        pages1 = codec.decode_document(blob)
        blob2 = codec.encode_document_v2(pages1)
        assert blob2[:4] == codec.MAGIC2
        pages2 = codec.decode_document(blob2)
        # every coordinate must be the SAME float64 (f32 widened the
        # same way on both paths) — extraction identity depends on it
        _pages_equal(pages1, pages2)


def test_v2_extraction_output_identical():
    for blob in _blobs(25):
        pages = codec.decode_document(blob)
        out1 = extract_document(blob)
        out2 = extract_document(codec.encode_document_v2(pages))
        assert out1 == out2


def test_v2_handles_none_natural_text_and_empty_pages():
    pg = codec.Page((0, 0, 612, 792), None, [])
    blob = codec.encode_document_v2([pg])
    back = codec.decode_document(blob)
    assert back[0].natural_text is None and back[0].boxes == []
