"""Ad-hoc per-query timing harness for optimization A/Bs (guide §1.4).

NOT part of the frozen bench.py contract: this file exists so that
noop-sink isolation runs, registry-wide sweeps and before/after numbers
quoted in OPTIMIZATION_r07.md are reproducible.

Usage:
  python bench_extra.py <sf_dir> <name_substr> [reps]   # time matching
  python bench_extra.py <sf_dir> --sweep [reps]         # whole registry
  python bench_extra.py <sf_dir> --synth                # corpus build only

Each query is labelled via setJobDescription and timed against the
noop sink (computes every column, discards the result).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
WHAT = sys.argv[2] if len(sys.argv) > 2 else "--sweep"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main():
    from parsee_pdf_reader_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("parsee-bench-extra", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.sql.files.maxPartitionBytes": "8m"})
    spark.sparkContext.setLogLevel("ERROR")

    if WHAT == "--synth":
        from parsee_pdf_reader_spark.sources.synth import synthesize_pages_df
        import shutil
        out = "/tmp/bench_extra_corpus"
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ts = []
        for _ in range(REPS):
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            synthesize_pages_df(spark, docs, replicate=10) \
                .write.mode("overwrite").parquet(out)
            n = spark.read.parquet(out).count()
            ts.append(time.time() - t0)
            print(f"  synthesize+write+count: {ts[-1]:.2f}s  rows={n}")
        print(f"synthesize_corpus median {statistics.median(ts):.2f}s")
        shutil.rmtree(out, ignore_errors=True)
        return

    import parsee_pdf_reader_spark.operators  # noqa: F401
    from parsee_pdf_reader_spark.plans.queries import REGISTRY

    names = list(REGISTRY)
    if WHAT != "--sweep":
        names = [n for n in names if WHAT in n]
    total = 0.0
    for name in names:
        fn = REGISTRY[name][0]
        ts = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        total += med
        spread = round((max(ts) - min(ts)) / med, 3) if med else 0.0
        print(f"{name:32s} {med:7.3f}s  spread {spread}")
    print(f"TOTAL {total:.2f}s over {len(names)} queries")


if __name__ == "__main__":
    main()
