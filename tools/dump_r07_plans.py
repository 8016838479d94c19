"""Dump .explain("formatted") for the r7-touched queries.

Usage: python tools/dump_r07_plans.py <repo_root> <suffix> [out_dir]

Imports the engine from <repo_root> (so a round-start worktree
produces the *_before.txt set), runs each query at sf0.001, and
writes plans/r07/<name>_<suffix>.txt under out_dir (default: the
CURRENT repo, so before/after land side by side).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

ROOT = sys.argv[1]
SUFFIX = sys.argv[2]
OUT = sys.argv[3] if len(sys.argv) > 3 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF = "/root/testdata/sf0.001"

NAMES = [
    "extract_pages_flagship",
    "pricing_summary", "revenue_by_nation", "topk_orders_per_priority",
    "sessionize_events", "rank_events_per_user",
    "doc_numeric_token_stats", "clean_numeric_tokens",
    "dedup_verify_pipeline", "dedup_minhash_lsh", "dedup_canonical",
    "dedup_simhash", "simhash_near_pairs_wide", "ngram_jaccard_pairs",
    "dup_span_stats", "dedup_against_index", "dedup_recall_exact_dups",
    "semdedup_keep", "ann_cosine_topk", "ann_ivf_topk",
    "kmeans_assign_r3", "media_byte_features",
    "decontam_ngram_overlap", "corpus_keep_filter", "mix_rebalance_plan",
    "doc_repetition_stats", "lang_id_heuristic", "token_counts",
    "tfidf_top_terms", "ngram_lm_score", "lm_ppl_buckets",
    "gopher_quality_rules", "c4_clean_text", "sentence_boilerplate",
    "seq_pack_materialize", "text_redact_pii", "html_strip_tags",
]


def main():
    import __spark_entry__ as em
    from parsee_pdf_reader_spark.session import get_spark

    out_dir = os.path.join(OUT, "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r07-plans", master="local[4]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    for name in NAMES:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name} (not registered)")
            continue
        try:
            df = fn(spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{SUFFIX}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
