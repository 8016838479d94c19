"""PLD1 — deterministic binary codec for char-level page layouts.

The engine's primary input is an Iceberg/parquet table of
Common-Crawl-style pages ``(url, warc_ts, html: binary, text, lang)``
(BASELINE.json ``input_hint``). In production the ``html`` column holds
raw PDF bytes parsed by pdfminer inside the kernel; in this sandbox the
native PDF libraries are unavailable, so documents are carried in PLD1:
a compact binary serialization of exactly the intermediate the PDF
parser would emit — pages of text boxes of lines of positioned chars
(mirroring pdfminer's LTTextBox/LTTextLine/LTChar tree, which is what
the reference consumes at ``pdf_reader/converter.py:117-132``).

The format is self-contained per document (page natural-text sidecars
included, standing in for pypdf's per-page ``extract_text``,
``converter.py:85-90``). Both the Spark kernel and the test-time
reference oracle decode the same bytes, so byte-identity of extraction
is checked on identical inputs.

Layout (little-endian):
    b"PLD1" | u16 n_pages
    per page:
        f64 x0, y0, x1, y1              (mediabox, pdfminer order)
        u32 len | utf8                  (natural text; 0xFFFFFFFF = None)
        u16 n_boxes
        per box:
            u8 kind (0 = textbox, 1 = loose chars, 2 = non-text rect)
            kind 2: f32 x0, x1, y0, y1
            else:   u16 n_lines (kind 1: always 1)
                per line: u16 n_chars
                    per char: f32 x0, x1, y0, y1, size
                              u8 flags (bit0 = bold)
                              u8 len | utf8
"""

from __future__ import annotations

import struct
from typing import List, Optional

MAGIC = b"PLD1"
_NONE_TEXT = 0xFFFFFFFF

KIND_TEXTBOX = 0
KIND_CHARS = 1
KIND_NONTEXT = 2


class Char:
    __slots__ = ("x0", "x1", "y0", "y1", "size", "bold", "text")

    def __init__(self, x0, x1, y0, y1, size, bold, text):
        # callers pass numeric values already (struct unpack / generator)
        self.x0 = x0
        self.x1 = x1
        self.y0 = y0
        self.y1 = y1
        self.size = size
        self.bold = bold
        self.text = text


class Box:
    """kind 0: lines = List[List[Char]]; kind 1: lines = [List[Char]];
    kind 2: rect only."""

    __slots__ = ("kind", "lines", "rect")

    def __init__(self, kind, lines=None, rect=None):
        self.kind = kind
        self.lines = lines or []
        self.rect = rect


class Page:
    __slots__ = ("mediabox", "natural_text", "boxes")

    def __init__(self, mediabox, natural_text, boxes):
        self.mediabox = tuple(mediabox)
        self.natural_text = natural_text
        self.boxes = boxes


def encode_document(pages: List[Page]) -> bytes:
    out = [MAGIC, struct.pack("<H", len(pages))]
    for p in pages:
        out.append(struct.pack("<4d", *p.mediabox))
        if p.natural_text is None:
            out.append(struct.pack("<I", _NONE_TEXT))
        else:
            b = p.natural_text.encode("utf-8")
            out.append(struct.pack("<I", len(b)))
            out.append(b)
        out.append(struct.pack("<H", len(p.boxes)))
        for box in p.boxes:
            out.append(struct.pack("<B", box.kind))
            if box.kind == KIND_NONTEXT:
                out.append(struct.pack("<4f", *box.rect))
                continue
            out.append(struct.pack("<H", len(box.lines)))
            for line in box.lines:
                out.append(struct.pack("<H", len(line)))
                for c in line:
                    tb = c.text.encode("utf-8")
                    out.append(
                        struct.pack(
                            "<5fBB", c.x0, c.x1, c.y0, c.y1, c.size,
                            1 if c.bold else 0, len(tb),
                        )
                    )
                    out.append(tb)
    return b"".join(out)


_U16 = struct.Struct("<H")
_U32 = struct.Struct("<I")
_MB = struct.Struct("<4d")
_RECT = struct.Struct("<4f")
_CHAR = struct.Struct("<5fBB")


def decode_document(buf: bytes) -> List[Page]:
    if buf[:4] != MAGIC:
        raise ValueError("not a PLD1 document")
    pos = 4
    (n_pages,) = _U16.unpack_from(buf, pos)
    pos += 2
    pages = []
    for _ in range(n_pages):
        mediabox = _MB.unpack_from(buf, pos)
        pos += 32
        (tlen,) = _U32.unpack_from(buf, pos)
        pos += 4
        if tlen == _NONE_TEXT:
            natural_text: Optional[str] = None
        else:
            natural_text = buf[pos:pos + tlen].decode("utf-8")
            pos += tlen
        (n_boxes,) = _U16.unpack_from(buf, pos)
        pos += 2
        boxes = []
        for _ in range(n_boxes):
            kind = buf[pos]
            pos += 1
            if kind == KIND_NONTEXT:
                rect = _RECT.unpack_from(buf, pos)
                pos += 16
                boxes.append(Box(kind, rect=rect))
                continue
            (n_lines,) = _U16.unpack_from(buf, pos)
            pos += 2
            lines = []
            unpack_char = _CHAR.unpack_from
            for _ in range(n_lines):
                (n_chars,) = _U16.unpack_from(buf, pos)
                pos += 2
                chars = []
                append = chars.append
                for _ in range(n_chars):
                    x0, x1, y0, y1, size, flags, ln = unpack_char(buf, pos)
                    pos += 22
                    text = buf[pos:pos + ln].decode("utf-8")
                    pos += ln
                    append(Char(x0, x1, y0, y1, size, flags & 1, text))
                lines.append(chars)
            boxes.append(Box(kind, lines=lines))
        pages.append(Page(mediabox, natural_text, boxes))
    return pages
