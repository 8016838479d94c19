"""Corpus curation verdict: the one query a pretraining pipeline
actually ships — language allowlist, quality floor, length bounds, and
the near-dup canonical keep, composed into a single per-document
``keep`` boolean (plus the per-criterion flags so rejected docs are
explainable).

The composition REUSES the registered operators — the Spark side calls
`q_dedup_canonical` / `q_doc_quality_scores`, and the DuckDB twin
embeds their registered SQL as subqueries — so the curation verdict
can never drift from the operators it is built on.

Scale: quality/lang/length are pure projections over the documents
scan; the only shuffles are the ones `dedup_canonical` already pays
(LSH band join + cluster window) plus two doc_id equi-joins that share
partitioning with it. No new hot keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parsee_pdf_reader_spark.operators.dedup import q_dedup_canonical
from parsee_pdf_reader_spark.operators.textstats import (
    q_doc_quality_scores,
)
from parsee_pdf_reader_spark.plans.queries import REGISTRY, _t, register

_LANGS = ("en", "de", "fr", "es")  # zh excluded at these thresholds
_LEN_LO = 100
_LEN_HI = 500

_LANG_SQL = ", ".join(f"'{x}'" for x in _LANGS)


def _twin(name: str) -> str:
    """Registered DuckDB oracle SQL of another operator, embedded as a
    subquery (DuckDB accepts WITH-queries inside FROM)."""
    return REGISTRY[name][1]


@register(
    "corpus_keep_filter",
    f"""
    select d.doc_id,
           c.keep as dedup_keep,
           (q.quality_bucket <> 'low') as quality_ok,
           (d.lang in ({_LANG_SQL})) as lang_ok,
           (d.n_chars between {_LEN_LO} and {_LEN_HI}) as len_ok,
           (c.keep and q.quality_bucket <> 'low'
            and d.lang in ({_LANG_SQL})
            and d.n_chars between {_LEN_LO} and {_LEN_HI}) as keep
    from documents d
    join ({_twin('dedup_canonical')}) c on c.doc_id = d.doc_id
    join ({_twin('doc_quality_scores')}) q on q.doc_id = d.doc_id
    """,
)
def q_corpus_keep_filter(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    canon = q_dedup_canonical(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("dedup_keep"))
    qual = q_doc_quality_scores(spark, sf_dir).select(
        "doc_id", (F.col("quality_bucket") != "low").alias("quality_ok"))
    lang_ok = F.col("lang").isin(*_LANGS)
    len_ok = (F.col("n_chars") >= _LEN_LO) & (F.col("n_chars") <= _LEN_HI)
    return (docs.join(canon, "doc_id").join(qual, "doc_id")
            .select(
                "doc_id", "dedup_keep", "quality_ok",
                lang_ok.alias("lang_ok"), len_ok.alias("len_ok"),
                (F.col("dedup_keep") & F.col("quality_ok")
                 & lang_ok & len_ok).alias("keep")))
