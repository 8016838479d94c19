"""Relational checklist breadth: rollup/grouping sets, set operations,
and an as-of join (an operator Spark lacks natively — composed from
window functions, per the custom-operator guidance)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parsee_pdf_reader_spark.plans.queries import _t, register


@register(
    "rollup_order_revenue",
    """
    select coalesce(o_orderpriority, 'ALL') as priority,
           coalesce(o_orderstatus, 'ALL') as status,
           cast(sum(cast(o_totalprice as decimal(18,4))) as double)
               as revenue,
           count(*) as n_orders
    from orders
    group by rollup(o_orderpriority, o_orderstatus)
    """,
)
def q_rollup_order_revenue(spark, sf_dir):
    """Hierarchical aggregates (rollup). Scale: one exchange; Spark
    expands grouping sets map-side, partial-aggregating each."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "revenue", "n_orders",
        )
    )


@register(
    "set_ops_customers",
    """
    select c_custkey, 'active_no_urgent' as tag from (
      select c_custkey from customer
      intersect
      select o_custkey from orders
      except
      select o_custkey from orders where o_orderpriority = '1-URGENT'
    ) t
    """,
)
def q_set_ops_customers(spark, sf_dir):
    """INTERSECT / EXCEPT (set operators). Scale: hash-partitioned
    semi/anti joins under the hood; AQE coalesces the small sides."""
    customer = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders")
    active = customer.intersect(
        orders.select(F.col("o_custkey").alias("c_custkey")))
    urgent = orders.where("o_orderpriority = '1-URGENT'").select(
        F.col("o_custkey").alias("c_custkey"))
    return active.exceptAll(urgent).distinct().select(
        "c_custkey", F.lit("active_no_urgent").alias("tag"))


@register(
    "asof_join_click_view",
    """
    with u as (
      select event_id as click_id, cast(NULL as bigint) as view_id,
             user_id, ts, 1 as is_click
      from events where event_type = 'click'
      union all
      select cast(NULL as bigint), event_id, user_id, ts, 0
      from events where event_type = 'view')
    select click_id, view_id, lag_sec from (
      select click_id, is_click,
             last_value(view_id ignore nulls) over w as view_id,
             round(epoch(ts) - epoch(last_value(
                 case when view_id is not null then ts end
                 ignore nulls) over w), 0) as lag_sec
      from u
      window w as (partition by user_id
                   order by ts, is_click, view_id asc nulls last
                   rows between unbounded preceding and current row)
    ) t where is_click = 1 and view_id is not null
    """,
)
def q_asof_join_click_view(spark, sf_dir):
    """As-of join: for every click, the most recent prior view of the
    same user. Spark has no ASOF operator — composed as a union-marker
    + last-non-null window (single exchange on user_id, no range
    explosion), the standard scalable formulation. The DuckDB twin uses
    the same windowed ANSI form (DuckDB's native ASOF JOIN has an
    unspecified tie-break on equal timestamps); ties are made
    deterministic with an explicit (ts, kind, view_id) ordering."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id", "ts",
        F.lit(1).alias("is_click"))
    views = ev.where("event_type = 'view'").select(
        F.col("event_id").alias("view_id"), "user_id", "ts",
        F.lit(0).alias("is_click"))
    u = clicks.unionByName(
        views.withColumn("click_id", F.lit(None).cast("long")),
        allowMissingColumns=True,
    ).unionByName(
        spark.createDataFrame([], clicks.schema)
        .withColumn("view_id", F.lit(None).cast("long")),
        allowMissingColumns=True,
    )
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts"), F.col("is_click"),
                  F.asc_nulls_last("view_id"))
         .rowsBetween(Window.unboundedPreceding, 0))
    joined = (
        u.withColumn("last_view_id",
                     F.last("view_id", ignorenulls=True).over(w))
        .withColumn("last_view_ts",
                    F.last(F.when(F.col("view_id").isNotNull(),
                                  F.col("ts")), ignorenulls=True).over(w))
        .where(F.col("is_click") == 1)
        .where(F.col("last_view_id").isNotNull())
    )
    # fractional-second epochs: DuckDB epoch() keeps microseconds,
    # Spark unix_timestamp() truncates — cast to double instead
    return joined.select(
        "click_id",
        F.col("last_view_id").alias("view_id"),
        F.round((F.unix_micros(F.col("ts").cast("timestamp"))
                 - F.unix_micros(F.col("last_view_ts").cast("timestamp")))
                / 1e6, 0).alias("lag_sec"),
    )


@register(
    "cube_order_revenue",
    """
    select coalesce(o_orderpriority, 'ALL') as priority,
           coalesce(o_orderstatus, 'ALL') as status,
           cast(grouping(o_orderpriority) as int) * 2
             + cast(grouping(o_orderstatus) as int) as grp_id,
           cast(sum(cast(o_totalprice as decimal(18,4))) as double)
               as revenue,
           count(*) as n_orders
    from orders
    group by cube(o_orderpriority, o_orderstatus)
    """,
)
def q_cube_order_revenue(spark, sf_dir):
    """Full CUBE with grouping() disambiguation (rollup's sibling in
    the grouping-sets family; grp_id distinguishes a real NULL value
    from a superaggregate row). Scale: one exchange, map-side partial
    aggregation per grouping set."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            (F.grouping("o_orderpriority").cast("int") * 2
             + F.grouping("o_orderstatus").cast("int")).alias("grp_id"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "grp_id", "revenue", "n_orders",
        )
    )


@register(
    "semi_anti_customer_orders",
    """
    select c_custkey, c_mktsegment, 'has_urgent' as tag
    from customer
    where exists (select 1 from orders
                  where o_custkey = c_custkey
                    and o_orderpriority = '1-URGENT')
    union all
    select c_custkey, c_mktsegment, 'no_orders' as tag
    from customer
    where not exists (select 1 from orders where o_custkey = c_custkey)
    """,
)
def q_semi_anti_customer_orders(spark, sf_dir):
    """Explicit LEFT SEMI and LEFT ANTI joins (the de-correlated forms
    of EXISTS / NOT EXISTS). Scale: both are one-sided — no row
    multiplication, the build side carries only the join key, and AQE
    broadcasts it when small."""
    customer = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.where("o_orderpriority = '1-URGENT'").select(
        F.col("o_custkey").alias("c_custkey"))
    has_urgent = customer.join(urgent, "c_custkey", "left_semi").select(
        "c_custkey", "c_mktsegment", F.lit("has_urgent").alias("tag"))
    no_orders = customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey", "left_anti").select(
        "c_custkey", "c_mktsegment", F.lit("no_orders").alias("tag"))
    return has_urgent.unionByName(no_orders)


@register(
    "events_trailing_hour_window",
    """
    select event_id, user_id,
           cast(sum(cast(value as decimal(18,6))) over w as double)
               as sum_1h,
           count(*) over w as cnt_1h
    from events
    window w as (partition by user_id
                 order by epoch_us(ts)
                 range between 3600000000 preceding and current row)
    """,
)
def q_events_trailing_hour_window(spark, sf_dir):
    """A RANGE-framed window (trailing one hour per user, microsecond
    precision) — the frame family the sessionization queries don't
    exercise. Decimal-exact sums keep the cross-engine hash stable.
    Scale: one exchange on user_id shared by both window functions."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (Window.partitionBy("user_id").orderBy(us.cast("long"))
         .rangeBetween(-3_600_000_000, 0))
    return ev.select(
        "event_id", "user_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w)
        .cast("double").alias("sum_1h"),
        F.count(F.lit(1)).over(w).alias("cnt_1h"),
    )


@register(
    "salted_user_stats",
    """
    select user_id,
           count(*) as n_events,
           cast(sum(cast(value as decimal(18,6))) as double) as sum_value,
           max(value) as max_value
    from events
    group by user_id
    """,
)
def q_salted_user_stats(spark, sf_dir):
    """EXPLICIT two-phase salted aggregation — the hot-key groupBy
    shape (north_rule: 'explicit salting of skewed hosts'). Phase 1
    aggregates on (user_id, salt) so a hot key's rows spread over
    _SALT buckets and combine map-side in parallel; phase 2 merges the
    per-salt partials (count -> sum, sum -> sum, max -> max). The
    result is EXACTLY the plain groupBy (decimal sums make float
    addition order-independent), which is what the oracle checks —
    salting must never change answers, only the shuffle layout.
    Spark's own map-side partial aggregation makes this redundant for
    count/sum/max; the pattern matters for aggregates without partial
    implementations (exact distinct lists, UDAFs) and is pinned here
    against its unsalted twin."""
    _SALT = 8
    events = _t(spark, sf_dir, "events")
    salted = events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(_SALT)))
    phase1 = salted.groupBy("user_id", "salt").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
        F.max("value").alias("m"),
    )
    return phase1.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.sum("s").cast("double").alias("sum_value"),
        F.max("m").alias("max_value"),
    )
