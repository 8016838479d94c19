from parsee_pdf_reader_spark.kernel.engine import (  # noqa: F401
    extract_document,
    extract_page,
)
