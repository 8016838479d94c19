"""Import the REFERENCE engine (/root/reference) with its native deps faked.

The reference's heavy dependencies (pdfminer, pypdf, cv2, pytesseract,
pdf2image, PIL, pillow_heif) are absent in this environment, but the
extraction engine itself (`pdf_reader/pdf_page.py`,
`custom_dataclasses.py`, `extract.py:make_paragraphs`) only needs them
for isinstance checks and for branches we never take in tests (OCR,
rasterization, file IO). This module installs minimal fake modules so
the real reference code can be imported and *executed* on synthetic
layout streams — giving us a genuine byte-identity oracle without
copying any reference code.

Only ever used from tests; the shipping engine never imports this.
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"


class _FakeLayoutBase:
    """Attribute-holder matching the surface the reference touches."""

    def __init__(self, x0=0.0, x1=0.0, y0=0.0, y1=0.0):
        self.x0 = x0
        self.x1 = x1
        self.y0 = y0
        self.y1 = y1


class FakeLTChar(_FakeLayoutBase):
    def __init__(self, x0, x1, y0, y1, text, size=10.0, fontname="Helvetica"):
        super().__init__(x0, x1, y0, y1)
        self._text = text
        self.size = size
        self.fontname = fontname

    def get_text(self):
        return self._text


class FakeLTAnno:
    """Non-LTChar line member (pdfminer appends LTAnno for spaces/newlines)."""

    def __init__(self, text):
        self._text = text

    def get_text(self):
        return self._text


class FakeLTTextLine(_FakeLayoutBase):
    def __init__(self, objs):
        xs0 = [o.x0 for o in objs if hasattr(o, "x0")]
        xs1 = [o.x1 for o in objs if hasattr(o, "x1")]
        ys0 = [o.y0 for o in objs if hasattr(o, "y0")]
        ys1 = [o.y1 for o in objs if hasattr(o, "y1")]
        super().__init__(
            min(xs0, default=0), max(xs1, default=0),
            min(ys0, default=0), max(ys1, default=0),
        )
        self._objs = list(objs)

    def get_text(self):
        return "".join(o.get_text() for o in self._objs)


class FakeLTTextBox(_FakeLayoutBase):
    def __init__(self, lines):
        super().__init__(
            min((ln.x0 for ln in lines), default=0),
            max((ln.x1 for ln in lines), default=0),
            min((ln.y0 for ln in lines), default=0),
            max((ln.y1 for ln in lines), default=0),
        )
        self._objs = list(lines)

    def get_text(self):
        return "".join(ln.get_text() for ln in self._objs)


class FakeLTFigure(_FakeLayoutBase):
    pass


class FakeLTPage(_FakeLayoutBase):
    pass


def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


_installed = False


def install_reference(force: bool = False):
    """Install fakes + sys.path and return the imported ``pdf_reader``."""
    global _installed
    if _installed and not force:
        import pdf_reader  # noqa

        return pdf_reader

    class _AnyCallable:
        def __init__(self, *a, **kw):
            pass

        def __call__(self, *a, **kw):
            raise NotImplementedError("faked native dependency invoked")

    # pdfminer family
    pm = _module("pdfminer")
    _module(
        "pdfminer.layout",
        LTTextBox=FakeLTTextBox,
        LTTextLine=FakeLTTextLine,
        LTChar=FakeLTChar,
        LTFigure=FakeLTFigure,
        LTPage=FakeLTPage,
        LAParams=_AnyCallable,
        Rect=tuple,
        PDFFont=_AnyCallable,
        PDFColorSpace=_AnyCallable,
        PDFGraphicState=_AnyCallable,
    )
    _module("pdfminer.pdfparser", PDFParser=_AnyCallable)
    _module(
        "pdfminer.pdfdocument",
        PDFDocument=_AnyCallable,
        PDFEncryptionError=type("PDFEncryptionError", (Exception,), {}),
    )
    _module(
        "pdfminer.pdfinterp",
        PDFResourceManager=_AnyCallable,
        PDFPageInterpreter=_AnyCallable,
    )
    _module("pdfminer.converter", PDFPageAggregator=_AnyCallable)
    _module("pdfminer.pdfpage", PDFPage=_AnyCallable)
    pm.layout = sys.modules["pdfminer.layout"]

    # others
    _module("pypdf", PdfReader=_AnyCallable)
    _module("pytesseract", Output=types.SimpleNamespace(DICT="dict"),
            image_to_data=_AnyCallable(), image_to_osd=_AnyCallable())
    _module("cv2", imread=_AnyCallable(), resize=_AnyCallable(),
            imwrite=_AnyCallable(), cvtColor=_AnyCallable(),
            INTER_AREA=3, INTER_CUBIC=2, COLOR_RGB2BGR=4)
    _module("pdf2image", convert_from_path=_AnyCallable(),
            pdfinfo_from_path=_AnyCallable())
    pil = _module("PIL")
    _module("PIL.Image", Image=_AnyCallable, open=_AnyCallable())
    _module("PIL.ImageDraw", Draw=_AnyCallable)
    _module("PIL.ImageFont", truetype=_AnyCallable())
    pil.Image = sys.modules["PIL.Image"]
    pil.ImageDraw = sys.modules["PIL.ImageDraw"]
    pil.ImageFont = sys.modules["PIL.ImageFont"]
    _module("pillow_heif", register_heif_opener=_AnyCallable())

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    import pdf_reader  # noqa
    import pdf_reader.extract  # noqa
    import pdf_reader.pdf_page  # noqa

    _installed = True
    return pdf_reader
