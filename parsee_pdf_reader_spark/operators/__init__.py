"""Large-scale training-data operators over the extracted corpus.

Importing this package registers every operator's (Spark, DuckDB-twin)
pair into ``plans.queries.REGISTRY``.
"""

from parsee_pdf_reader_spark.operators import dedup  # noqa: F401
from parsee_pdf_reader_spark.operators import similarity  # noqa: F401
from parsee_pdf_reader_spark.operators import textstats  # noqa: F401
from parsee_pdf_reader_spark.operators import curation  # noqa: F401
from parsee_pdf_reader_spark.operators import multimodal  # noqa: F401
from parsee_pdf_reader_spark.operators import html_extract  # noqa: F401
from parsee_pdf_reader_spark.plans import relational_extra  # noqa: F401
from parsee_pdf_reader_spark.operators import evaluation  # noqa: F401
