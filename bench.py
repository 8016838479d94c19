"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "spread": {...per-query rel...},
   "sf": <sf>, "docs_per_sec": <extraction throughput>, ...}

The flagship extraction is measured over a pages corpus synthesized
from the documents table and materialized to parquet first, so the
timed section is scan -> Arrow kernel -> count (the production shape).

Every timed item runs SPARK_GRAFT_BENCH_REPS (default 3) passes over
the warm corpus and reports the MEDIAN, with the relative spread
(max-min)/median alongside (VERDICT r3 item 7: this host swings ±35%
between identical runs, so single-shot round-over-round deltas chased
box noise).

Set SPARK_GRAFT_BENCH_SCALING=1 to also run the two-parallelism scaling
probe (local[8] vs local[32]) and include efficiency in the line.

Scope (deliberate): the timed set is the extraction flagships plus the
relational queries registered by plans/queries.py — NOT the full
operator registry (the operators package is intentionally not imported
here). The per-round correctness gate runs every registered operator
cross-engine at sf0.01; per-operator wall times at sf0.1 are tracked
by ad-hoc registry sweeps recorded in BENCH/BASELINE.md (round 5:
"operator-perf wave" — the sweep is what exposed the HOF
re-evaluation hazards). Keeping the headline set stable across rounds
keeps BENCH_r{N} deltas comparable.

One registry op IS promoted into the headline (VERDICT r5 item 8):
``dedup_verify_pipeline`` — the full shingle -> MinHash -> LSH ->
exact-Jaccard-verify chain — so a regression in the HOF/binding layer
(the r5 perf wave's subject) surfaces in BENCH_r{N} deltas, not only
in ad-hoc sweeps. It is timed AFTER the stable relational set and
imported surgically so the rest of the operator registry stays out of
the headline.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


REPLICATE = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "10"))


def build_corpus(spark, sf_dir: str, out_dir: str) -> int:
    from parsee_pdf_reader_spark.sources.synth import synthesize_pages_df

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = docs.count() * REPLICATE
    try:  # deterministic corpus: reuse if complete
        n = spark.read.parquet(out_dir).count()
        if n == expected:
            return n
    except Exception:
        pass
    pages = synthesize_pages_df(spark, docs, replicate=REPLICATE)
    pages.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir).count()


PDF_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_PDF_DOCS", "2000"))


def build_pdf_corpus(spark, sf_dir: str, out_dir: str) -> int:
    """Real %PDF corpus slice (VERDICT r2 item 7): deterministic PDFs
    written by synth.build_pdf_document, so the timed path includes
    pdf_mini parse + LAParams grouping, not just the PLD codec."""
    import pandas as pd

    from parsee_pdf_reader_spark.sources.synth import build_pdf_document

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").where(f"doc_id < {PDF_DOCS}"))
    expected = docs.count()
    try:
        n = spark.read.parquet(out_dir).count()
        if n == expected:
            return n
    except Exception:
        pass

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                blob = build_pdf_document(f"doc{int(doc_id)}", 42, text)
                rows.append({
                    "url": f"https://pdf.example/{int(doc_id)}.pdf",
                    "warc_ts": None, "html": blob, "text": text,
                    "lang": "en"})
            if rows:
                yield pd.DataFrame(rows)

    (docs.repartition(64).mapInPandas(
        gen, schema="url string, warc_ts timestamp, html binary, "
                    "text string, lang string")
     .write.mode("overwrite").parquet(out_dir))
    return spark.read.parquet(out_dir).count()


def time_extraction(spark, corpus_dir: str, subset_mod: int = 0) -> tuple:
    """Returns (wall_sec, n_docs). subset_mod>0 keeps a deterministic
    1/subset_mod hash-slice of the corpus (fast scaling probes)."""
    from pyspark.sql import functions as F

    from parsee_pdf_reader_spark.pipeline import extract_pages

    src = spark.read.parquet(corpus_dir)
    if subset_mod:
        src = src.where(F.pmod(F.xxhash64("url"), F.lit(subset_mod)) == 0)
    n_docs = src.count()
    t0 = time.time()
    out = extract_pages(src)
    n_err = out.where("error is not null").count()
    dt = time.time() - t0
    assert n_err == 0, f"extraction errors: {n_err}"
    return dt, n_docs


REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def _median_runs(fn):
    """Run fn() REPS times; returns (median_sec, rel_spread) where fn
    returns elapsed seconds."""
    ts = [fn() for _ in range(REPS)]
    med = statistics.median(ts)
    spread = round((max(ts) - min(ts)) / med, 3) if med else 0.0
    return med, spread


def main():
    from parsee_pdf_reader_spark.session import get_spark
    from parsee_pdf_reader_spark.plans.queries import REGISTRY

    sf = _sf_from_dir(SF_DIR)
    corpus_dir = os.path.join(tempfile.gettempdir(),
                              f"parsee_bench_corpus_{os.path.basename(SF_DIR)}")

    # kernel-bound stages need fine-grained input splits: a blob row is
    # ~20KB but costs ~10ms of kernel time, so the default 128m
    # partitions leave most cores idle (measured 0.29 scaling
    # efficiency before; near-linear after)
    blob_conf = {"spark.ui.enabled": "false",
                 "spark.sql.files.maxPartitionBytes": "8m"}
    spark = get_spark("parsee-bench", master=f"local[{CPUS}]",
                      extra_conf=blob_conf)
    spark.sparkContext.setLogLevel("ERROR")

    timings = {}
    spreads = {}

    t0 = time.time()
    n_docs = build_corpus(spark, SF_DIR, corpus_dir)
    timings["synthesize_corpus"] = round(time.time() - t0, 3)

    # a freshly-written corpus leaves GBs of dirty pages; background
    # writeback competing with the timed read measured as a 2.8x
    # extraction slowdown (557 vs 1390 docs/s on identical code).
    # Force the flush to complete, then warm with a 1/16 slice.
    os.sync()
    time_extraction(spark, corpus_dir, subset_mod=16)

    t_ex, spreads["extract_pages"] = _median_runs(
        lambda: time_extraction(spark, corpus_dir)[0])
    timings["extract_pages"] = round(t_ex, 3)
    docs_per_sec = round(n_docs / t_ex, 2)

    # real-%PDF slice: pdf_mini parse + LAParams grouping + kernel
    pdf_dir = corpus_dir + "_pdf"
    t0 = time.time()
    n_pdf = build_pdf_corpus(spark, SF_DIR, pdf_dir)
    timings["synthesize_pdf_corpus"] = round(time.time() - t0, 3)
    os.sync()
    t_pdf, spreads["extract_pdf_pages"] = _median_runs(
        lambda: time_extraction(spark, pdf_dir)[0])
    timings["extract_pdf_pages"] = round(t_pdf, 3)
    pdf_docs_per_sec = round(n_pdf / t_pdf, 2)

    def _run_query(fn):
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for name, (fn, _sql) in list(REGISTRY.items()):
        med, spreads[name] = _median_runs(lambda f=fn: _run_query(f))
        timings[name] = round(med, 3)

    # promoted dedup headline row (imported after the loop so the rest
    # of the operator registry stays out of the timed set)
    from parsee_pdf_reader_spark.operators.dedup import (
        q_dedup_verify_pipeline,
    )

    med, spreads["dedup_verify_pipeline"] = _median_runs(
        lambda: _run_query(q_dedup_verify_pipeline))
    timings["dedup_verify_pipeline"] = round(med, 3)

    result = {
        "metric": "docs/sec extraction + headline query wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "spread": spreads,
        "reps": REPS,
        "sf": sf,
        "docs": n_docs,
        "docs_per_sec": docs_per_sec,
        "pdf_docs": n_pdf,
        "pdf_docs_per_sec": pdf_docs_per_sec,
        "cpus": CPUS,
    }

    if os.environ.get("SPARK_GRAFT_BENCH_SCALING") == "1":
        spark.stop()
        # N -> 4N criterion. 2->8 stays within the machine's PHYSICAL
        # cores; 8->32 additionally spans SMT threads (a raw
        # multiprocessing control shows the hardware itself tops out at
        # ~0.53 efficiency over that span — see BENCH/BASELINE.md).
        # Best-of-REPS per level: the host throttles in multi-minute
        # windows, and a throttled window hitting ONE leg skews the
        # ratio both ways — best-of approximates the unthrottled
        # capability at each level (same box, interleaved runs).
        scaling = {}
        subset_dir = corpus_dir + "_scaling_subset"
        for cores in (2, 8, 32):
            s = get_spark(f"parsee-bench-{cores}",
                          master=f"local[{cores}]",
                          extra_conf=blob_conf)
            s.sparkContext.setLogLevel("ERROR")
            if cores == 2:  # materialize the probe slice once
                from pyspark.sql import functions as F

                try:
                    expected = (s.read.parquet(corpus_dir)
                                .where(F.pmod(F.xxhash64("url"),
                                              F.lit(4)) == 0).count())
                    have = s.read.parquet(subset_dir).count()
                    ok = have == expected
                except Exception:
                    ok = False
                if not ok:
                    (s.read.parquet(corpus_dir)
                     .where(F.pmod(F.xxhash64("url"), F.lit(4)) == 0)
                     .repartition(64)
                     .write.mode("overwrite").parquet(subset_dir))
            # first run pays Python worker startup + page-cache warmup
            best = None
            for _rep in range(max(2, REPS)):
                dt, n_sub = time_extraction(s, subset_dir)
                thr = n_sub / dt
                best = thr if best is None or thr > best else best
            scaling[str(cores)] = round(best, 2)
            s.stop()
        result["scaling_docs_per_sec"] = scaling
        result["scaling_efficiency_2_to_8"] = round(
            (scaling["8"] / scaling["2"]) / 4, 3)
        result["scaling_efficiency_8_to_32"] = round(
            (scaling["32"] / scaling["8"]) / 4, 3)
    else:
        spark.stop()

    if os.environ.get("SPARK_GRAFT_BENCH_KEEP_CORPUS") != "1":
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(corpus_dir + "_pdf", ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
