"""Bucketed co-located join: pre-bucketing both sides of a recurring
join key removes the per-query shuffle entirely — the 100 TB pattern
for repeatedly joining extractions back to their source pages (or
dedup verdicts back to documents). Asserted on the PLAN: the bucketed
join contains NO Exchange; the unbucketed control contains at least
one."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    import shutil

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang")
    stats = docs.select(
        "doc_id", F.length("text").alias("n_chars_live"))
    spark.sql("drop table if exists b_docs")
    spark.sql("drop table if exists b_stats")
    # the in-memory catalog forgets tables between sessions but their
    # managed locations persist — clear them or saveAsTable fails with
    # LOCATION_ALREADY_EXISTS on re-runs
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_docs", "b_stats"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    (docs.write.mode("overwrite").bucketBy(8, "doc_id")
        .sortBy("doc_id").saveAsTable("b_docs"))
    (stats.write.mode("overwrite").bucketBy(8, "doc_id")
        .sortBy("doc_id").saveAsTable("b_stats"))
    return True


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, warehouse):
    a = spark.table("b_docs")
    b = spark.table("b_stats")
    joined = a.join(b, "doc_id").select("doc_id", "lang", "n_chars_live")
    # disable broadcast so the join strategy itself is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        n = joined.count()
        assert n == spark.table("b_docs").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_control_shuffles(spark, warehouse):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang")
    stats = docs.select("doc_id")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(docs.join(stats, "doc_id"))
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
