"""AQE runtime skew handling: a hot join key must be SPLIT by the
adaptive skew-join optimizer at execution time (north_rule: 'explicit
salting of skewed hosts and AQE-tuned shuffle' — rebalance_by_size is
the explicit half, this pins the AQE half). Thresholds are scaled down
so a toy corpus triggers the real machinery (defaults are 256MB-scale)."""

from pyspark.sql import functions as F


def test_aqe_skew_join_splits_hot_key(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        hot = spark.range(30000).select(
            F.lit("hot-host.example").alias("host"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"))
        cold = spark.range(64).select(
            F.concat(F.lit("h"), F.col("id").cast("string"))
            .alias("host"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"))
        right = spark.createDataFrame(
            [("hot-host.example", 1)]
            + [(f"h{i}", 0) for i in range(64)],
            "host string, label int")

        joined = hot.union(cold).join(right, "host")
        rows = joined.collect()
        # correctness first: every row joined despite the hot key
        assert len(rows) == 30064
        assert sum(1 for r in rows if r.label == 1) == 30000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # AQE detected the hot reduce partition and split it, marking
        # the join and its shuffle read
        assert "skew=true" in plan, plan[:1500]
        assert "skewed" in plan.split("== Initial Plan ==")[0], plan[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
