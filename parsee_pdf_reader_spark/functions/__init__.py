from parsee_pdf_reader_spark.functions.scalars import (  # noqa: F401
    letter_len,
    words_contained,
    word_count,
    is_number_cell,
    is_negative,
    comma_separator_thousands,
    dot_separator_thousands,
    clean_numeric_value,
    clean_text_for_matching,
)
