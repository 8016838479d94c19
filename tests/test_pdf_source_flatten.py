"""pdf_source._flatten over the shim's fake pdfminer layout tree.

Round-1 ADVICE: pdfminer interleaves LTAnno members (virtual
space/newline: has get_text but NO bbox) in nearly every real text
line; a hasattr(get_text) filter would crash _char_of on them. The
fix filters by isinstance(LTChar) like the reference
(pdf_page.py:148). refshim's fake pdfminer makes the previously
"untestable, import-gated" path testable.
"""

import refshim


def _flatten_with_shim():
    refshim.install_reference()
    from parsee_pdf_reader_spark.sources.pdf_source import _flatten

    return _flatten


def test_flatten_skips_ltanno_members(reference):
    _flatten = _flatten_with_shim()
    chars = [refshim.FakeLTChar(10 + 6 * i, 16 + 6 * i, 700, 710,
                                ch) for i, ch in enumerate("ab")]
    line = refshim.FakeLTTextLine(
        [chars[0], refshim.FakeLTAnno(" "), chars[1],
         refshim.FakeLTAnno("\n")])
    box = refshim.FakeLTTextBox([line])
    out = []
    _flatten([box], out)
    assert len(out) == 1
    (lnchars,) = out[0].lines
    # LTAnno members dropped; LTChars kept with their geometry
    assert [c.text for c in lnchars] == ["a", "b"]
    assert lnchars[0].x0 == 10 and lnchars[1].x1 == 22


def test_flatten_keeps_loose_chars_and_textlines(reference):
    _flatten = _flatten_with_shim()
    out = []
    box = refshim.FakeLTTextBox([refshim.FakeLTTextLine(
        [refshim.FakeLTChar(1, 7, 90, 99, "q")])])
    loose = refshim.FakeLTChar(5, 10, 50, 60, "z")
    _flatten([box, loose], out)
    assert len(out) == 2
    assert out[0].kind == 0 and out[0].lines[0][0].text == "q"
    assert out[1].kind == 1 and out[1].lines[0][0].text == "z"
