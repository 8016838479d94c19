"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for correctness at local[*] test scale while keeping every knob
meaningful on a 1000-executor cluster:

- AQE on (runtime coalescing + skew split);
- Arrow transport on with a bounded batch size, because extraction
  kernels carry whole documents per row — batches are sized by bytes,
  not row count, via ``maxRecordsPerBatch`` kept small;
- shuffle partitions default 32 locally; on a real cluster this is
  superseded by AQE's advisory size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF = {
    # zstd parquet output (guide §6): the PLD2 corpus compresses 3x
    # smaller than snappy (474 -> 154 MB at bench scale) at equal read
    # speed and slightly faster writes — measured A/B in
    # OPTIMIZATION_r07.md; read-side values are unchanged.
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # one document can be ~MBs of layout bytes; keep Arrow batches small
    "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "parsee-pdf-reader-spark",
              master: str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(ENGINE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
