"""DuckDB-SQL twins of :mod:`parsee_pdf_reader_spark.functions.scalars`.

Each function returns a SQL expression string over a column expression
``c`` so that DuckDB evaluates the same semantics as the Spark column
expression. Used by ``__spark_entry__.oracle_sql()``.

Dialect notes:
- DuckDB ``regexp_replace`` replaces the FIRST match unless the ``'g'``
  flag is passed — Spark/Python replace all, so every twin passes 'g';
- DuckDB regexes are RE2: no backrefs (none used), ``\\b`` supported.
"""

from __future__ import annotations

from parsee_pdf_reader_spark.functions import scalars as S


def _q(pattern: str) -> str:
    return "'" + pattern.replace("'", "''") + "'"


def letter_len(c: str) -> str:
    return f"length(regexp_replace({c}, {_q(S.RE_NON_LETTER)}, '', 'g'))"


def words_contained(c: str) -> str:
    return (
        f"list_filter(string_split_regex({c}, {_q(S.RE_WORD_SPLIT)}),"
        " x -> x <> '')"
    )


def word_count(c: str) -> str:
    return f"len({words_contained(c)})"


def is_number_cell(c: str) -> str:
    stripped = f"regexp_replace({c}, {_q(S.RE_NUM_FILTER)}, '', 'g')"
    return f"coalesce(regexp_matches({stripped}, '^[0-9]+$'), false)"


def comma_separator_thousands(c: str) -> str:
    return f"regexp_matches({c}, {_q(S.RE_COMMA_THOUSANDS)})"


def dot_separator_thousands(c: str) -> str:
    return f"regexp_matches({c}, {_q(S.RE_DOT_THOUSANDS)})"


def is_negative(c: str) -> str:
    t = f"trim({c})"
    return (
        f"(regexp_matches({t}, {_q(S.RE_MINUS)})"
        f" or regexp_matches({t}, {_q(S.RE_PAREN_NEG)}))"
    )


def clean_numeric_value(c: str) -> str:
    mult = f"(case when {is_negative(c)} then -1.0 else 1.0 end)"
    s1 = f"regexp_replace({c}, '[^0-9,.]', '', 'g')"
    s2 = (
        f"(case when {comma_separator_thousands(s1)}"
        f" then regexp_replace({s1}, ',', '', 'g')"
        f" when {dot_separator_thousands(s1)}"
        f" then regexp_replace({s1}, '\\.', '', 'g')"
        f" else {s1} end)"
    )
    s3 = f"regexp_replace({s2}, ',', '.', 'g')"
    ok = (
        f"(regexp_matches({s3}, '^[0-9]*\\.?[0-9]*$')"
        f" and regexp_matches({s3}, '[0-9]'))"
    )
    return (
        f"(case when {ok} then cast({s3} as double) * {mult}"
        " else cast(NULL as double) end)"
    )


def clean_text_for_matching(c: str) -> str:
    return f"lower(regexp_replace({c}, {_q(S.RE_MATCH_CLEAN)}, '', 'g'))"
