"""Run the REFERENCE engine on PLD1 documents -> golden outputs.

Converts decoded layout pages into fake pdfminer objects (refshim),
feeds them through the reference's real per-page pipeline
(``ParseePdfPage.extract_text_and_tables`` + ``extract.make_paragraphs``)
and serializes the results into plain dicts. These are the byte-identity
goldens the Spark kernel must match.
"""

from __future__ import annotations

import decimal
from typing import List, Optional

import refshim
from parsee_pdf_reader_spark.sources import layout_codec as codec


def _to_lt(page: codec.Page):
    refshim.install_reference()
    out = []
    for box in page.boxes:
        if box.kind == codec.KIND_TEXTBOX:
            lines = []
            for chars in box.lines:
                lt_chars = [
                    refshim.FakeLTChar(
                        c.x0, c.x1, c.y0, c.y1, c.text, c.size,
                        "Helvetica-Bold" if c.bold else "Helvetica",
                    )
                    for c in chars
                ]
                lines.append(refshim.FakeLTTextLine(lt_chars))
            out.append(refshim.FakeLTTextBox(lines))
        elif box.kind == codec.KIND_CHARS:
            for chars in box.lines:
                out.extend(
                    refshim.FakeLTChar(
                        c.x0, c.x1, c.y0, c.y1, c.text, c.size,
                        "Helvetica-Bold" if c.bold else "Helvetica",
                    )
                    for c in chars
                )
        else:  # non-text rect
            r = box.rect
            out.append(refshim._FakeLayoutBase(r[0], r[1], r[2], r[3]))
    return out


def _ser_dec(v) -> Optional[str]:
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return str(v)
    return str(v)


def _ser_table(t) -> dict:
    return {
        "g_index": t.g_index,
        "num_rows": t.num_rows,
        "num_cols": t.num_cols,
        "area": t.table_area.list(),
        "total_value_area": t.total_value_area.list(),
        "value_areas": [a.list() for a in t.value_areas],
        "items": [
            {
                "caption": li.caption,
                "caption_area": li.el.list(),
                "values": [
                    {"v": v.val, "n": _ser_dec(v.val_clean)}
                    for v in li.values
                ],
            }
            for li in t.items
        ],
    }


def reference_extract_document(blob: bytes, min_rows: int = 2,
                               min_cols: int = 1,
                               areas_by_page=None) -> List[dict]:
    """Golden per-page outputs for one PLD1 document.

    areas_by_page: {page_index: [(class_name, x0, x1, y0, y1, prob)]}
    relative layout-model boxes, like extract.py's detected_areas."""
    pdf_reader = refshim.install_reference()
    from pdf_reader.custom_dataclasses import (
        ExtractedFigure,
        ExtractedTable,
        NaturalTextHelper,
        PdfReaderConfig,
        PdfParagraph,
        RelativeAreaPrediction,
    )
    from pdf_reader.extract import (
        make_paragraphs,
        relative_areas_to_area_predictions,
    )
    from pdf_reader.pdf_page import ParseePdfPage

    pages = codec.decode_document(blob)
    out = []
    for page_index, page in enumerate(pages):
        text_boxes = _to_lt(page)
        p = ParseePdfPage(
            page_index, "", page.mediabox, text_boxes,
            PdfReaderConfig(None, None, None),
            NaturalTextHelper(page.natural_text),
        )
        elements = p.extract_text_and_tables(min_rows=min_rows,
                                             min_cols=min_cols)
        areas = None
        if areas_by_page and page_index in areas_by_page:
            rel = [RelativeAreaPrediction(*a)
                   for a in areas_by_page[page_index]]
            areas = relative_areas_to_area_predictions(
                rel, p.page_size.width(), p.page_size.height())
        paragraphs = make_paragraphs(
            elements, PdfReaderConfig(20, 10, 6), areas,
            p.natural_text.text_raw, p.page_size.width(),
        )
        tables = [_ser_table(t) for t in elements
                  if isinstance(t, ExtractedTable)]
        para_items = []
        for el in paragraphs:
            if isinstance(el, ExtractedTable):
                para_items.append(
                    {"kind": "table", "text": "",
                     "box": [el.x0, el.x1, el.y0, el.y1]})
            elif isinstance(el, ExtractedFigure):
                para_items.append(
                    {"kind": "figure", "text": el.get_text(),
                     "box": [el.x0, el.x1, el.y0, el.y1]})
            elif isinstance(el, PdfParagraph):
                para_items.append(
                    {"kind": "p", "text": el.get_text(),
                     "box": [el.x0, el.x1, el.y0, el.y1]})
            else:
                para_items.append(
                    {"kind": "el", "text": el.get_text(),
                     "box": [el.x0, el.x1, el.y0, el.y1]})
        extracted_text = "\n\n".join(
            x["text"] for x in para_items if x["text"])
        out.append(
            {
                "page_index": page_index,
                "extracted_text": extracted_text,
                "paragraphs": para_items,
                "tables": tables,
                "n_elements": len(elements),
            }
        )
    return out
