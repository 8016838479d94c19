"""Real-PDF byte parsing (reference converter.py:55-132, S1-S3) —
import-gated; absent in this container.

Production path: ``html`` carries raw PDF bytes; this module parses
them **in memory** (``io.BytesIO`` — never a filesystem path: the
reference's qpdf decrypt rewrites its input in place,
converter.py:41-52, which is forbidden on executors; encrypted inputs
here go through a pure-bytes pypdf/pikepdf decrypt fallback) and
flattens the pdfminer layout tree into the kernel's stream items with
``parse_layout`` semantics (converter.py:117-132): descend into
LTFigure, keep LTTextBox whole, keep loose LTChar, descend LTTextLine.

When pdfminer is unavailable the PLD1 codec is the only decoder and
``pdf_available()`` is False (tests assert the gate, not the parse).
"""

from __future__ import annotations

import io
from typing import List, Optional

from parsee_pdf_reader_spark.sources.layout_codec import Box, Char, Page


def pdf_available() -> bool:
    try:
        import pdfminer

        # the test shim installs attribute-only fakes; a real install
        # carries a version marker
        return getattr(pdfminer, "__version__", None) is not None
    except Exception:
        return False


def _char_of(lt_char) -> Char:
    return Char(lt_char.x0, lt_char.x1, lt_char.y0, lt_char.y1,
                getattr(lt_char, "size", 0.0),
                "bold" in getattr(lt_char, "fontname", "").lower(),
                lt_char.get_text())


def _flatten(layout_obj, out: List[Box]):
    from pdfminer.layout import LTChar, LTFigure, LTTextBox, LTTextLine

    for lt in layout_obj:
        if isinstance(lt, LTFigure):
            _flatten(lt, out)
        elif isinstance(lt, LTTextBox):
            lines = []
            for o in lt._objs:
                if isinstance(o, LTTextLine):
                    # isinstance(LTChar), NOT hasattr(get_text): pdfminer
                    # interleaves LTAnno (virtual space/newline) members
                    # that have get_text but no bbox, and the reference
                    # tokenizer skips them (pdf_page.py:148)
                    lines.append([_char_of(c) for c in o._objs
                                  if isinstance(c, LTChar)])
            out.append(Box(0, lines=lines))
        elif isinstance(lt, LTChar):
            out.append(Box(1, lines=[[_char_of(lt)]]))
        elif isinstance(lt, LTTextLine):
            out.append(Box(1, lines=[[_char_of(c) for c in lt._objs
                                      if isinstance(c, LTChar)]]))


def parse_pdf_bytes(pdf_bytes: bytes) -> Optional[List[Page]]:
    """PDF bytes -> kernel pages, or None if pdfminer is unavailable."""
    if not pdf_available():
        return None
    from pdfminer.converter import PDFPageAggregator
    from pdfminer.layout import LAParams
    from pdfminer.pdfdocument import PDFDocument, PDFEncryptionError
    from pdfminer.pdfinterp import PDFPageInterpreter, PDFResourceManager
    from pdfminer.pdfpage import PDFPage
    from pdfminer.pdfparser import PDFParser

    buf = io.BytesIO(pdf_bytes)
    parser = PDFParser(buf)
    try:
        document = PDFDocument(parser, password="")
    except PDFEncryptionError:
        # pure-bytes decrypt fallback (no filesystem mutation)
        try:
            import pypdf

            reader = pypdf.PdfReader(io.BytesIO(pdf_bytes))
            if reader.is_encrypted:
                reader.decrypt("")
            out = io.BytesIO()
            writer = pypdf.PdfWriter()
            for p in reader.pages:
                writer.add_page(p)
            writer.write(out)
            parser = PDFParser(io.BytesIO(out.getvalue()))
            document = PDFDocument(parser, password="")
        except Exception:
            raise
    rsrcmgr = PDFResourceManager()
    device = PDFPageAggregator(rsrcmgr, laparams=LAParams())
    interpreter = PDFPageInterpreter(rsrcmgr, device)

    natural_texts = {}
    try:
        import pypdf

        reader = pypdf.PdfReader(io.BytesIO(pdf_bytes))
        for i, p in enumerate(reader.pages):
            try:
                natural_texts[i] = p.extract_text()
            except Exception:
                natural_texts[i] = None
    except Exception:
        pass

    pages: List[Page] = []
    for i, page in enumerate(PDFPage.create_pages(document)):
        interpreter.process_page(page)
        layout = device.get_result()
        boxes: List[Box] = []
        _flatten(layout, boxes)
        pages.append(Page(tuple(page.mediabox), natural_texts.get(i),
                          boxes))
    return pages
