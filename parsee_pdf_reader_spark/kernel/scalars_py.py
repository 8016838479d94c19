"""Pure-Python scalar twins for in-kernel use.

Same semantics as the Spark column expressions in
``functions/scalars.py`` (and the reference ``helper.py:19-168``); used
inside the Arrow kernel where values are plain Python strings.
"""

from __future__ import annotations

import re
from decimal import Decimal
from functools import lru_cache
from typing import List, Optional

_NUM_FILTER = re.compile(r"(\([^0-9 ]*\))|[^0-9A-Za-z/]")
_NON_LETTER = re.compile("[^A-Za-z]")
_WORD_SPLIT = re.compile("[^A-Za-z0-9%$€£¥]")
_MINUS = re.compile("(-|—|–|‒|―|–|−)( | |)*\\d")
_PAREN_NEG = re.compile(r"\([\d ,.%]+(\)|\b)")
_COMMA_TH = re.compile(r"\b\d{1,3}[,]\d{3}\b")
_DOT_TH = re.compile(r"\b\d{1,3}[.]\d{3}\b")
_NON_NUMERIC = re.compile(r"[^0-9,.]")
_MATCH_CLEAN = re.compile(r"[^A-Za-z.,\d]")


# pure string->bool/int predicates, called repeatedly on the SAME token
# texts across kernel stages (column detection, run qualification,
# grid typing) — memoized; token vocabulary per page is small
@lru_cache(maxsize=65536)
def is_number_cell(s: Optional[str]) -> bool:
    if s is None:
        return False
    return _NUM_FILTER.sub("", s).isdigit()


@lru_cache(maxsize=65536)
def letter_len(s: str) -> int:
    return len(_NON_LETTER.sub("", s))


def words_contained(s: str) -> List[str]:
    return [w for w in _WORD_SPLIT.sub(" ", s).split(" ") if w != ""]


def is_negative(s: str) -> bool:
    t = s.strip()
    return bool(_MINUS.search(t)) or bool(_PAREN_NEG.search(t))


def clean_numeric_value(s: str) -> Optional[Decimal]:
    mult = -1 if is_negative(s) else 1
    s = _NON_NUMERIC.sub("", s)
    if _COMMA_TH.search(s):
        s = s.replace(",", "")
    elif _DOT_TH.search(s):
        s = s.replace(".", "")
    s = s.replace(",", ".")
    if s.replace(".", "", 1).isdigit():
        return Decimal(s) * mult
    return None


def clean_text_for_matching(s: str) -> str:
    return _MATCH_CLEAN.sub("", s).lower()
