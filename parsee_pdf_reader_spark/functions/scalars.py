"""Scalar functions of the extraction engine as native Spark column
expressions.

These mirror the semantics of the reference's scalar helpers
(`/root/reference/pdf_reader/helper.py:19-168` and
`custom_dataclasses.py:770-771`) but are expressed as pure
``pyspark.sql.functions`` column expressions so they run JVM-side under
whole-stage codegen — no Python in the hot path (cf. BASELINE.json
``input_hint``: "no per-row Python").

Every function has a DuckDB-SQL twin in
:mod:`parsee_pdf_reader_spark.functions.oracle` used by the driver's
correctness gate; keep the two in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- regex vocabulary (single source of truth, shared with oracle.py) ---

#: keep-letters pattern, reference helper.py:20
RE_NON_LETTER = "[^A-Za-z]"

#: word-splitting charset, reference helper.py:27
RE_WORD_SPLIT = "[^A-Za-z0-9%$€£¥]"

#: numeric-cell filter, reference helper.py:16 — strips parenthesized
#: non-digit groups (footnote markers like "(a)") and all chars outside
#: [0-9A-Za-z/], then requires the remainder to be all digits.
RE_NUM_FILTER = r"(\([^0-9 ]*\))|[^0-9A-Za-z/]"

#: unicode-minus family before a digit, reference helper.py:141
#: (the alternation includes U+00A0 NBSP inside the optional spacer)
RE_MINUS = "(-|—|–|‒|―|–|−)( | |)*[0-9]"

#: parenthesized amount, reference helper.py:144
RE_PAREN_NEG = r"\([0-9 ,.%]+(\)|\b)"

#: thousands separators, reference helper.py:128,134
RE_COMMA_THOUSANDS = r"\b[0-9]{1,3},[0-9]{3}\b"
RE_DOT_THOUSANDS = r"\b[0-9]{1,3}\.[0-9]{3}\b"

#: match-text normalizer, reference custom_dataclasses.py:771
RE_MATCH_CLEAN = r"[^A-Za-z.,\d]"


def letter_len(col: Column) -> Column:
    """Count of [A-Za-z] chars (reference helper.py:19-21)."""
    return F.length(F.regexp_replace(col, RE_NON_LETTER, ""))


def words_contained(col: Column) -> Column:
    """Array of word fragments after splitting on the reference charset
    (helper.py:24-27); empty fragments dropped."""
    return F.filter(F.split(col, RE_WORD_SPLIT), lambda x: x != "")


def word_count(col: Column) -> Column:
    """``len(words_contained(...))`` as a column."""
    return F.size(words_contained(col))


def is_number_cell(col: Column) -> Column:
    """True when the cell is numeric after the reference's filter regex
    (helper.py:30-37): strip ``(non-digit)`` groups + non-[0-9A-Za-z/],
    then ``str.isdigit()`` (== all-ASCII-digits, non-empty, since only
    ASCII survives the filter). NULL input -> false (helper.py:31-32)."""
    stripped = F.regexp_replace(col, RE_NUM_FILTER, "")
    return F.coalesce(stripped.rlike("^[0-9]+$"), F.lit(False))


def comma_separator_thousands(col: Column) -> Column:
    """helper.py:127-130."""
    return col.rlike(RE_COMMA_THOUSANDS)


def dot_separator_thousands(col: Column) -> Column:
    """helper.py:133-136."""
    return col.rlike(RE_DOT_THOUSANDS)


def is_negative(col: Column) -> Column:
    """Negative-amount predicate (helper.py:139-146): unicode-minus
    family before a digit, or a parenthesized amount; evaluated on the
    trimmed string like the reference's ``cell_str.strip()``."""
    t = F.trim(col)
    return t.rlike(RE_MINUS) | t.rlike(RE_PAREN_NEG)


def clean_numeric_value(col: Column) -> Column:
    """Full numeric normalizer (helper.py:149-168) as a column chain:

    1. sign from :func:`is_negative`;
    2. strip everything outside ``[0-9,.]``;
    3. drop the detected thousands separator (comma wins over dot);
    4. remaining comma becomes the decimal dot;
    5. accept only strings that are digits after removing at most one
       dot (Python ``replace('.', '', 1).isdigit()``), else NULL.

    Returns DOUBLE (the reference returns ``Decimal``; callers that
    need exactness scale to integers)."""
    mult = F.when(is_negative(col), F.lit(-1.0)).otherwise(F.lit(1.0))
    s = F.regexp_replace(col, "[^0-9,.]", "")
    s = (
        F.when(comma_separator_thousands(s), F.regexp_replace(s, ",", ""))
        .when(dot_separator_thousands(s), F.regexp_replace(s, r"\.", ""))
        .otherwise(s)
    )
    s = F.regexp_replace(s, ",", ".")
    # digits with at most one dot, at least one digit (".5" -> 0.5, "5." -> 5)
    ok = s.rlike(r"^[0-9]*\.?[0-9]*$") & s.rlike("[0-9]")
    return F.when(ok, s.cast("double") * mult).otherwise(F.lit(None).cast("double"))


def clean_text_for_matching(col: Column) -> Column:
    """Keep ``[A-Za-z.,0-9]`` and lowercase (custom_dataclasses.py:770-771)."""
    return F.lower(F.regexp_replace(col, RE_MATCH_CLEAN, ""))
