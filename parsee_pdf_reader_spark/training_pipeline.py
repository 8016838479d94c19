"""End-to-end training-data pipeline: the composition a pretraining
corpus build actually runs.

    pages (url, warc_ts, html, text, lang)
      -> latest-snapshot-per-url prune (re-crawls: newest warc_ts
         wins, BEFORE the extraction kernel pays for stale bytes)
      -> content dispatch (layout / html / unknown)
      -> extraction (layout kernel | DOM boilerplate strip)
      -> document quality filter (length / stopword signals)
      -> exact dedup on the EXTRACTED text (canonical url wins)
      -> near-dup clustering (MinHash LSH pairs -> connected
         components) with a longest-doc-wins keep verdict
      -> token accounting

Every stage is the operator already tested in isolation; this module
is the composition, demonstrating that the pieces share one schema and
one partitioning story (dispatch + extraction are maps; dedup is the
single hash-exchange; the filter is a codegen'd projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parsee_pdf_reader_spark.operators.html_extract import (
    extract_web_pages,
    sniff_kind_col,
)
from parsee_pdf_reader_spark.pipeline import extract_pages

_BPE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def latest_snapshot_per_url(pages_df: DataFrame) -> DataFrame:
    """Keep only the newest crawl snapshot of each url (re-crawled
    pages appear once per ``warc_ts``; production corpora keep the
    latest and drop the stale bytes BEFORE the expensive extraction
    kernel ever runs — input-side pruning, the same reasoning as
    predicate pushdown). One window on the url key; ties on warc_ts
    (same-second re-fetch) break by the larger payload, then by
    content digest — a TOTAL order over distinct rows, so retries and
    repartitioning cannot flip the winner even for same-length
    variants (null html sorts last at every level)."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(
        F.desc("warc_ts"),
        F.desc(F.coalesce(F.length("html"), F.lit(-1))),
        F.desc(F.coalesce(F.md5("html"), F.lit(""))))
    return (pages_df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def build_training_corpus(pages_df: DataFrame,
                          min_tokens: int = 30) -> DataFrame:
    """pages -> deduplicated, quality-filtered training rows:
    (url, warc_ts, lang, source_kind, doc_text, n_tokens, bpe_tokens,
    is_canonical, near_dup_cluster, keep). The training set is
    ``where keep``: exact-canonical AND the longest doc of its
    near-dup component."""
    # mandatory, not optional: url is the document identity of every
    # downstream stage (canonical window, cluster join, keep rank), so
    # multiple snapshots of one url MUST be resolved first — and doing
    # it here means the extraction kernel never pays for stale bytes
    pages_df = latest_snapshot_per_url(pages_df)
    kind = sniff_kind_col()
    layout_rows = (
        extract_pages(pages_df.where(kind == "layout"))
        .where(F.col("error").isNull())
        .groupBy("url", "warc_ts", "lang")
        .agg(F.concat_ws(
            "\n\n",
            F.array_sort(
                F.collect_list(F.struct("page_index", "extracted_text"))
            ).getField("extracted_text"),
        ).alias("doc_text"))
        .withColumn("source_kind", F.lit("layout"))
    )
    web_rows = (
        extract_web_pages(pages_df.where(kind == "html"))
        .where(F.col("error").isNull())
        .select("url", "warc_ts", "lang",
                F.col("main_text").alias("doc_text"))
        .withColumn("source_kind", F.lit("html"))
    )
    docs = layout_rows.unionByName(web_rows)

    toks = F.filter(F.split("doc_text", r"\s+"), lambda x: x != "")
    docs = docs.withColumn("n_tokens", F.size(toks)).withColumn(
        "bpe_tokens",
        F.size(F.regexp_extract_all("doc_text", F.lit(_BPE), 0)))
    docs = docs.where(F.col("n_tokens") >= min_tokens)

    # exact dedup on extracted text; first url (lexicographic) canonical
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("doc_text"))
    docs = docs.withColumn(
        "is_canonical", F.col("url") == F.min("url").over(w))

    # near-dup closure over the exact-canonical survivors: LSH pairs
    # -> connected components -> keep the longest doc per component
    # (composition of dedup.minhash_pairs_df + connected_components_df,
    # each oracle-verified in isolation)
    from parsee_pdf_reader_spark.operators.dedup import (
        connected_components_df,
        minhash_pairs_df,
    )

    canon = docs.where("is_canonical")
    pairs = minhash_pairs_df(canon, id_col="url", text_col="doc_text") \
        .select("doc_a", "doc_b")
    clusters = connected_components_df(pairs).select(
        F.col("doc_id").alias("url"), "cluster_id")
    out = docs.join(clusters, "url", "left").withColumn(
        "near_dup_cluster", F.coalesce("cluster_id", "url")).drop(
        "cluster_id")
    # rank only among exact-canonical rows — a non-canonical twin must
    # not steal rank 1 and sink its whole cluster
    wk = Window.partitionBy("near_dup_cluster").orderBy(
        F.desc("n_tokens"), F.asc("url"))
    keeps = (out.where("is_canonical")
             .withColumn("keep", F.row_number().over(wk) == 1)
             .select("url", "keep"))
    return out.join(keeps, "url", "left").withColumn(
        "keep", F.coalesce("keep", F.lit(False)))
