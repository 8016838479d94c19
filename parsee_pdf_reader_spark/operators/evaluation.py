"""Dedup-stack evaluation harness (VERDICT r4 item 8): plant
deterministic near-dup families into a corpus, then measure each
candidate generator's recall against the planted truth.

This is an EVALUATION surface, not a production query: a real
deployment runs it on a sampled slice to validate parameter choices
(bands, rows, hash width, hamming bound) before a 100 TB pass, exactly
like the Manku 2007 paper's parameter-sweep tables. The planted
variants are small token edits, so their true Jaccard/hamming
similarity sits well inside each method's design envelope — 100%
planted recall at the shipped parameters is the acceptance bar
(``test_dedup_stack_planted_recall``), while the ``n_extra`` column
surfaces how much additional (unplanted, possibly genuine) pairing
each method emits on the same corpus.

The harness reuses the REGISTERED query implementations byte-for-byte
(it writes the planted corpus as a documents table and calls the same
functions the driver gate runs) — it cannot drift from what ships.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F


def plant_near_dup_corpus(spark: SparkSession, docs: DataFrame,
                          out_dir: str, n_families: int = 12
                          ) -> DataFrame:
    """Write ``out_dir/documents.parquet`` = ``docs`` plus one planted
    near-dup variant for each of the ``n_families`` smallest doc_ids,
    alternating two edit types (append a rare token / drop the last
    token). Returns the planted truth as (doc_a, doc_b, edit)
    with doc_a < doc_b. Deterministic — no RNG, ids derive from the
    max existing id."""
    base = (docs.select("doc_id", "text")
            .orderBy("doc_id").limit(n_families).collect())
    next_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    variants, planted = [], []
    for k, row in enumerate(base):
        vid = next_id + k
        if k % 2 == 0:
            vtext, edit = row.text + " zqx", "append_token"
        else:
            cut = row.text.rfind(" ")
            vtext, edit = (row.text[:cut] if cut > 0
                           else row.text + " zqy"), "drop_token"
        variants.append((vid, vtext))
        planted.append((row.doc_id, vid, edit))
    corpus = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame(variants, "doc_id long, text string"))
    corpus.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet"))
    return spark.createDataFrame(
        planted, "doc_a long, doc_b long, edit string")


def dedup_recall_report(spark: SparkSession, sf_dir: str,
                        planted: DataFrame) -> DataFrame:
    """One row per shipped candidate generator over the planted
    corpus at ``sf_dir``: (method, n_planted, n_eligible, n_found,
    n_emitted, n_extra, recall).

    ``n_eligible`` qualifies the truth by each method's CONTRACT —
    recall is only meaningful against pairs the method promises to
    find:

    - MinHash-LSH (and its verified composition) promises high-Jaccard
      pairs; every planted edit is a one-token change, so all planted
      pairs are eligible;
    - SimHash banding promises EXACTLY the pairs within
      hamming <= max_ham of the 63-bit hash (the Manku pigeonhole —
      proven exhaustively in ``test_simhash_near_pairs_wide_recall``);
      a token edit that moves the frequency-weighted hash further than
      that is outside the envelope by design, so eligibility is
      computed from the pair's ACTUAL hamming distance.

    ``recall`` = n_found / n_eligible and the acceptance bar is 1.0
    for every method. ``n_extra`` = emitted-but-unplanted pairs — not
    necessarily false positives (the base corpus can contain genuine
    near-dups); the verify stage's extras carry exact Jaccard evidence
    by construction."""
    from parsee_pdf_reader_spark.operators.dedup import (
        _toks, q_dedup_minhash_lsh, q_dedup_verify_pipeline,
        q_simhash_near_pairs_wide, simhash_col,
    )

    truth = planted.select(
        F.least("doc_a", "doc_b").alias("lo"),
        F.greatest("doc_a", "doc_b").alias("hi"))
    # simhash envelope: planted pairs within hamming <= 3 at 63 bits
    hashes = (spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", simhash_col(_toks(), 63).alias("sh")))
    ha = hashes.select(F.col("doc_id").alias("lo"),
                       F.col("sh").alias("sh_a"))
    hb = hashes.select(F.col("doc_id").alias("hi"),
                       F.col("sh").alias("sh_b"))
    sim_truth = (truth.join(ha, "lo").join(hb, "hi")
                 .where(F.bit_count(
                     F.col("sh_a").bitwiseXOR(F.col("sh_b"))) <= 3)
                 .select("lo", "hi"))

    methods = [
        ("minhash_lsh", q_dedup_minhash_lsh, truth),
        ("minhash_lsh_verified", q_dedup_verify_pipeline, truth),
        ("simhash_wide_bands", q_simhash_near_pairs_wide, sim_truth),
    ]
    reports = []
    for name, fn, eligible in methods:
        pairs = fn(spark, sf_dir).select(
            F.least("doc_a", "doc_b").alias("lo"),
            F.greatest("doc_a", "doc_b").alias("hi")).distinct()
        hit = pairs.join(eligible, ["lo", "hi"], "left_semi")
        stats = (pairs.agg(F.count(F.lit(1)).alias("n_emitted"))
                 .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_found")))
                 .crossJoin(eligible.agg(
                     F.count(F.lit(1)).alias("n_eligible")))
                 .crossJoin(truth.agg(
                     F.count(F.lit(1)).alias("n_planted"))))
        reports.append(stats.select(
            F.lit(name).alias("method"), "n_planted", "n_eligible",
            "n_found", "n_emitted",
            (F.col("n_emitted") - F.col("n_found")).alias("n_extra"),
            F.round(F.col("n_found") / F.col("n_eligible"), 4)
            .alias("recall")))
    return reduce(lambda a, b: a.unionByName(b), reports)
