"""Adobe Core-14 (standard-14) font widths, ASCII range.

The PDF spec permits omitting /Widths for the 14 standard Type1 fonts;
a conforming reader supplies the metrics itself. pdfminer 20221105
(the engine the reference pins via ``converter.py:63-67``) ships the
full AFM-derived tables and — crucially — prefers them over any
/Widths array whenever BaseFont is an exact standard-14 name
(pdfminer ``pdffont.py`` ``PDFType1Font.__init__``: the metrics-DB
lookup comes first, /Widths is only the KeyError fallback). Without
these, simple generated PDFs using non-embedded Helvetica/Times get
flat 500/1000em advances, shifting every x-gap that the reference's
tight tokenization thresholds (SPACE_MAX_DISTANCE=6, char_dist_max=1,
``custom_dataclasses.py:12-32``) depend on.

The numbers are the published Adobe AFM advance widths (Core-14 AFM
files, public and redistributable per Adobe's AFM license), re-keyed
by unicode char exactly as pdfminer's generated ``fontmetrics.py``
does, restricted to printable ASCII (32..126):

- that range covers the synth corpus and the overwhelming majority of
  web-PDF text;
- glyphs OUTSIDE the table fall back to the caller's MissingWidth
  (500), a deliberate, documented divergence from pdfminer (which has
  the full Latin set and defaults truly-unknown glyphs to 0) — 500 is
  geometrically saner than 0 for the rare accented glyph, and Courier
  is exact everywhere (fixed 600);
- Symbol and ZapfDingbats are omitted (non-textual glyph sets; they
  take the /Widths-or-MissingWidth path) — also documented in
  COVERAGE.md.

Oblique/Italic faces share their upright face's advances in the AFM
data (true for Helvetica and Courier; Times has distinct italic
metrics, included below).
"""

from __future__ import annotations

from typing import Dict, Optional

# chars 32..126, one advance per char (units per 1000 em)
_HELVETICA = """
278 278 355 556 556 889 667 191 333 333 389 584 278 333 278 278
556 556 556 556 556 556 556 556 556 556 278 278 584 584 584 556
1015 667 667 722 722 667 611 778 722 278 500 667 556 833 722 778
667 778 722 667 611 722 667 944 667 667 611 278 278 278 469 556
333 556 556 500 556 556 278 556 556 222 222 500 222 833 556 556
556 556 333 500 278 556 500 722 500 500 500 334 260 334 584
"""

_HELVETICA_BOLD = """
278 333 474 556 556 889 722 238 333 333 389 584 278 333 278 278
556 556 556 556 556 556 556 556 556 556 333 333 584 584 584 611
975 722 722 722 722 667 611 778 722 278 556 722 611 833 722 778
667 778 722 667 611 722 667 944 667 667 611 333 278 333 584 556
333 556 611 556 611 556 333 611 611 278 278 556 278 889 611 611
611 611 389 556 333 611 556 778 556 556 500 389 280 389 584
"""

_TIMES_ROMAN = """
250 333 408 500 500 833 778 180 333 333 500 564 250 333 250 278
500 500 500 500 500 500 500 500 500 500 278 278 564 564 564 444
921 722 667 667 722 611 556 722 722 333 389 722 611 889 722 722
556 722 667 556 611 722 722 944 722 722 611 333 278 333 469 500
333 444 500 444 500 444 333 500 500 278 278 500 278 778 500 500
500 500 333 389 278 500 500 722 500 500 444 480 200 480 541
"""

_TIMES_BOLD = """
250 333 555 500 500 1000 833 278 333 333 500 570 250 333 250 278
500 500 500 500 500 500 500 500 500 500 333 333 570 570 570 500
930 722 667 722 722 667 611 778 778 389 500 778 667 944 722 778
611 778 722 556 667 722 722 1000 722 722 667 333 278 333 581 500
333 500 556 444 556 444 333 500 556 278 333 556 278 833 556 500
556 556 444 389 333 556 500 722 500 500 444 394 220 394 520
"""

_TIMES_ITALIC = """
250 333 420 500 500 833 778 214 333 333 500 675 250 333 250 278
500 500 500 500 500 500 500 500 500 500 333 333 675 675 675 500
920 611 611 667 722 611 611 722 722 333 444 667 556 833 667 722
611 722 611 500 556 722 611 833 611 556 556 389 278 389 422 500
333 500 500 444 500 444 278 500 500 278 278 444 278 722 500 500
500 500 389 389 278 500 444 667 444 444 389 400 275 400 541
"""

_TIMES_BOLDITALIC = """
250 389 555 500 500 833 778 278 333 333 500 570 250 333 250 278
500 500 500 500 500 500 500 500 500 500 333 333 570 570 570 500
832 667 667 667 722 667 667 722 778 389 500 667 611 889 722 722
611 722 667 556 611 722 667 889 667 611 611 333 278 333 570 500
333 500 500 444 500 444 333 500 556 278 278 500 278 778 556 500
500 500 389 389 278 556 444 667 500 444 389 348 220 348 570
"""


def _table(spec: str) -> Dict[str, int]:
    vals = [int(v) for v in spec.split()]
    assert len(vals) == 95, len(vals)
    t = {chr(32 + i): w for i, w in enumerate(vals)}
    return _with_accents(t)


def _with_accents(t: Dict[str, int]) -> Dict[str, int]:
    """Extend an ASCII table to accented Latin glyphs by the AFM
    composite rule: in the Core-14 AFMs every composite glyph
    (Aacute, edieresis, ntilde, ...) carries its BASE letter's advance
    — the accent mark adds no width. So decompose each Latin-1/
    Latin-Extended-A letter (NFD) and inherit the base width. This is
    exact for the composites; glyphs with no ASCII base (thorn, eth,
    euro, dashes, curly quotes...) stay out and take the caller's
    MissingWidth fallback."""
    import unicodedata

    out = dict(t)
    for cp in range(0xC0, 0x180):  # Latin-1 letters + Latin Ext-A
        ch = chr(cp)
        if not ch.isalpha():
            continue
        base = unicodedata.normalize("NFD", ch)[0]
        w = t.get(base)
        if w is not None:
            out[ch] = w
    return out


_COURIER = _with_accents({chr(c): 600 for c in range(32, 127)})

#: exact standard-14 BaseFont names -> {char: advance/1000em}; lookup
#: is exact-name (no subset-prefix stripping: subset-prefixed fonts
#: are embedded by definition, and pdfminer likewise misses them)
STD14_WIDTHS: Dict[str, Dict[str, int]] = {
    "Helvetica": _table(_HELVETICA),
    "Helvetica-Oblique": _table(_HELVETICA),
    "Helvetica-Bold": _table(_HELVETICA_BOLD),
    "Helvetica-BoldOblique": _table(_HELVETICA_BOLD),
    "Times-Roman": _table(_TIMES_ROMAN),
    "Times-Bold": _table(_TIMES_BOLD),
    "Times-Italic": _table(_TIMES_ITALIC),
    "Times-BoldItalic": _table(_TIMES_BOLDITALIC),
    "Courier": _COURIER,
    "Courier-Bold": _COURIER,
    "Courier-Oblique": _COURIER,
    "Courier-BoldOblique": _COURIER,
}


def std14_table(basefont: str) -> Optional[Dict[str, int]]:
    """Width table for an exact standard-14 BaseFont name, else None
    (Symbol/ZapfDingbats deliberately absent — see module docstring)."""
    return STD14_WIDTHS.get(basefont)


def text_width(basefont: str, s: str, missing: int = 500) -> int:
    """Sum of advances (units/1000em) for ``s`` in a standard-14 font;
    raises KeyError for non-standard names (callers that synthesize
    PDFs should know their font)."""
    t = STD14_WIDTHS[basefont]
    return sum(t.get(ch, missing) for ch in s)
