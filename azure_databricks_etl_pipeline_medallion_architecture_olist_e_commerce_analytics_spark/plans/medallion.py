"""The Olist-equivalent medallion pipeline, expressed over the driver testdata.

This is the engine's flagship plan: a bronze → silver → gold star-schema
pipeline that re-expresses every operator of the reference DLT pipeline
(SURVEY.md §2) on the driver's synthetic TPC-H-ish tables, using the role
mapping from FIXTURES.md §B:

    orders → orders           customers → customer      sellers → supplier
    order_items → lineitem    products → part           geolocations → events
    payments → lineitem-per-order aggregates            reviews → events

Layer structure mirrors the reference:
- bronze: raw landing reads (bronze_ingestion.py:35-53's table factory).
- silver: typed, validated Python-API tables — casts, imputation, literal-map
  lookups, broadcast joins, dedup, expectations (scripts/silver/*.py).
- gold: SQL materialized views with ``LIVE.`` references — surrogate-keyed
  dims, a generated date dimension, and a multi-way star fact with
  fail-level constraints (scripts/gold/*.sql).

Determinism: every gold column is reproducible (no current_timestamp in gold;
silver audit columns are not propagated), so the whole pipeline is verifiable
against a DuckDB oracle.

Scale notes: dims join the fact via broadcast (they are orders of magnitude
smaller than the fact at any SF); per-order aggregates shuffle once on the
join key they are later joined on; window dedup partitions by the dedup key
(no global windows except the tiny date dimension's ordinal).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.maps import mapping_column
from .registry import Pipeline

# Literal lookup map, same pattern as the reference's 27-state expansion
# (silver_customers.py:20-49,64-72): map literal instead of nested WHENs.
SEGMENT_DISPLAY = {
    "AUTOMOBILE": "Automobile & Parts",
    "BUILDING": "Building & Construction",
    "FURNITURE": "Furniture & Home",
    "MACHINERY": "Machinery & Industrial",
    "HOUSEHOLD": "Household Goods",
}

BRONZE_TABLES = (
    "orders",
    "lineitem",
    "customer",
    "supplier",
    "part",
    "nation",
    "region",
    "events",
)


def build_pipeline(sf_dir: str) -> Pipeline:
    """Construct the full medallion pipeline bound to a testdata directory."""
    from ..sources.loader import load_table

    p = Pipeline("olist_analog_medallion")

    # ---------------- bronze: parameterized landing-table factory ----------
    # Reference: metaprogrammed @dlt.table loop over 9 datasets
    # (bronze_ingestion.py:35-53). Same factory pattern, parquet source.
    def _make_bronze(tbl: str):
        @p.table(
            name=f"bronze.bronze_{tbl}",
            comment=f"Raw {tbl} landed from source (incremental at ingest).",
            table_properties={"quality": "bronze"},
            streaming=True,
        )
        def _bronze(ctx, _tbl=tbl):
            return load_table(ctx.spark_session, sf_dir, _tbl)

    for t in BRONZE_TABLES:
        _make_bronze(t)

    # ---------------- silver ----------------------------------------------
    @p.view(name="stage_orders", comment="Staged bronze orders stream.")
    def stage_orders(ctx):
        return ctx.read_stream("bronze.bronze_orders")

    @p.table(
        name="silver.silver_orders",
        comment="Typed, validated orders.",
        table_properties={"quality": "silver"},
        streaming=True,
    )
    @p.expect_all(
        {
            "order_key_not_null": "o_orderkey IS NOT NULL",
            "cust_key_not_null": "o_custkey IS NOT NULL",
        }
    )
    def silver_orders(ctx):
        # Cast + conditional imputation with interval arithmetic — the
        # order_approved_at pattern (Silver_orders.py:27-40).
        df = ctx.read_stream("stage_orders")
        return (
            df.withColumns(
                {
                    "o_orderdate": F.col("o_orderdate").cast("timestamp"),
                    "o_totalprice": F.col("o_totalprice").cast("double"),
                }
            )
            .withColumn(
                "o_approved_at",
                F.when(
                    F.col("o_orderstatus") == "F",
                    F.col("o_orderdate") + F.expr("INTERVAL 18 MINUTES"),
                ).otherwise(F.lit(None).cast("timestamp")),
            )
            .withColumn("o_is_urgent", F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            # Audit column, as every reference silver table (Silver_orders.py:41).
            .withColumn("processed_at", F.current_timestamp())
        )

    @p.table(
        name="silver.silver_lineitem",
        comment="Typed, validated line items (order_items analog).",
        table_properties={"quality": "silver"},
        streaming=True,
    )
    @p.expect_all(
        {
            "order_key_not_null": "l_orderkey IS NOT NULL",
            "positive_reasonable_price": "l_extendedprice >= 0 AND l_extendedprice <= 100000",
            "non_negative_qty": "l_quantity >= 0",
        }
    )
    def silver_lineitem(ctx):
        # Explicit typed projection, as Silver_order_items.py:48-60.
        df = ctx.read_stream("bronze.bronze_lineitem")
        return df.select(
            F.col("l_orderkey"),
            F.col("l_linenumber").cast("int").alias("l_linenumber"),
            F.col("l_partkey"),
            F.col("l_suppkey"),
            F.col("l_quantity").cast("double").alias("l_quantity"),
            F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
            F.col("l_discount").cast("double").alias("l_discount"),
            F.col("l_tax").cast("double").alias("l_tax"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
            F.col("l_shipdate").cast("timestamp").alias("l_shipdate"),
        )

    @p.table(
        name="silver.silver_customer",
        comment="Customers with literal-map segment expansion and broadcast nation join.",
        table_properties={"quality": "silver"},
        streaming=True,
    )
    @p.expect_all(
        {
            "customer_key_not_null": "c_custkey IS NOT NULL",
            "nation_key_not_null": "c_nationkey IS NOT NULL",
        }
    )
    def silver_customer(ctx):
        # Map-literal lookup with fallback (silver_customers.py:64-78) +
        # broadcast left join to a small static dim (silver_products.py:66-71).
        cust = ctx.read_stream("bronze.bronze_customer")
        nation = ctx.read("bronze.bronze_nation").select(
            F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("c_nation_name")
        )
        return (
            cust.withColumn("c_nationkey", F.col("c_nationkey").cast("int"))
            .withColumn(
                "c_segment_display",
                mapping_column(
                    SEGMENT_DISPLAY, F.col("c_mktsegment"), default=F.col("c_mktsegment")
                ),
            )
            .join(F.broadcast(nation), on="c_nationkey", how="left")
        )

    @p.table(
        name="silver.silver_supplier",
        comment="Suppliers with string cleanup (sellers analog).",
        table_properties={"quality": "silver"},
        streaming=True,
    )
    @p.expect("supplier_name_nonempty", "LENGTH(s_name) >= 2")
    def silver_supplier(ctx):
        # trim/upper cleanup, as silver_sellers.py:96-109.
        df = ctx.read_stream("bronze.bronze_supplier")
        nation = ctx.read("bronze.bronze_nation").select(
            F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("s_nation_name")
        )
        return (
            df.withColumn("s_name", F.upper(F.trim(F.col("s_name"))))
            .withColumn("s_nationkey", F.col("s_nationkey").cast("int"))
            .join(F.broadcast(nation), on="s_nationkey", how="left")
        )

    @p.table(
        name="silver.silver_part",
        comment="Parts with derived metrics, null-defaults, dedup (products analog).",
        table_properties={"quality": "silver"},
        streaming=True,
    )
    @p.expect_all({"part_key_not_null": "p_partkey IS NOT NULL", "size_non_negative": "p_size >= 0"})
    def silver_part(ctx):
        # Derived metrics + fillna + boolean flags + dedup
        # (silver_products.py:76-119).
        df = ctx.read_stream("bronze.bronze_part")
        return (
            df.withColumn("p_size", F.col("p_size").cast("int"))
            .fillna(0, subset=["p_size"])
            .withColumn("p_category", F.coalesce(F.col("p_type"), F.lit("N/A")))
            .withColumn("p_volume_index", F.col("p_size") * F.col("p_size") * F.col("p_size"))
            .withColumn("p_is_premium", F.col("p_retailprice") > F.lit(1500.0))
            .dropDuplicates(["p_partkey"])
        )

    @p.view(name="stage_events", comment="Staged bronze events stream.")
    def stage_events(ctx):
        return ctx.read_stream("bronze.bronze_events")

    @p.table(
        name="silver.silver_events",
        comment="Deduplicated, imputed user events (order_reviews analog).",
        table_properties={"quality": "silver"},
        streaming=True,
    )
    @p.expect_all(
        {
            "event_id_not_null": "event_id IS NOT NULL",
            "valid_value": "value IS NOT NULL",
        }
    )
    def silver_events(ctx):
        # Stream-stream join + dedup + coalesce-chain imputation + interval
        # arithmetic — the order_reviews pattern (order_reviews.py:39-78).
        events = ctx.read_stream("stage_events")
        last_order = (
            ctx.read_stream("silver.silver_orders")
            .groupBy("o_custkey")
            .agg(F.max("o_orderdate").alias("last_order_date"))
        )
        return (
            events.join(last_order, events.user_id == last_order.o_custkey, "inner")
            .dropDuplicates(["event_id"])
            .select(
                "event_id",
                F.col("ts").cast("timestamp").alias("ts"),
                "user_id",
                F.coalesce(F.col("event_type"), F.lit("N/A")).alias("event_type"),
                F.col("value").cast("double").alias("value"),
                F.coalesce(
                    F.col("ts"), F.col("last_order_date") + F.expr("INTERVAL 1 DAY")
                ).alias("event_time_imputed"),
                (F.col("ts") + F.expr("INTERVAL 3 DAY")).alias("followup_deadline"),
            )
        )

    @p.table(
        name="silver.silver_nation",
        comment="Passthrough nation reference (geolocations-analog passthrough).",
        table_properties={"quality": "silver"},
    )
    def silver_nation(ctx):
        # Passthrough table, as silver_geolocations.py:3-11.
        return ctx.read("bronze.bronze_nation")

    @p.table(
        name="silver.silver_region",
        comment="Passthrough region reference (category-translation analog).",
        table_properties={"quality": "silver"},
    )
    def silver_region(ctx):
        return ctx.read("bronze.bronze_region")

    # ---------------- gold: SQL materialized views -------------------------
    _register_gold(p)
    return p


def _register_gold(p: Pipeline) -> None:
    from .expectations import Expectation

    # dim_orders — surrogate key + KPI flags (dim_orders.sql:12-37).
    p.materialized_view(
        "gold.dim_orders",
        comment="Order dimension with deterministic surrogate keys and KPIs.",
        table_properties={"quality": "gold", "layer": "analytics"},
        sql="""
SELECT
  sha2(CAST(o_orderkey AS STRING), 256) AS order_key,
  o_orderkey AS order_natural_key,
  o_orderstatus,
  o_orderpriority,
  o_is_urgent,
  DATE(o_orderdate) AS order_date,
  CASE WHEN o_approved_at IS NOT NULL
       THEN datediff(DATE(o_approved_at), DATE(o_orderdate))
       ELSE NULL END AS approval_lag_days,
  CASE WHEN o_orderstatus = 'F' THEN TRUE ELSE FALSE END AS is_fulfilled
FROM LIVE.silver_orders
""",
    )

    # dim_customers — geo-enriched via window-dedup subquery
    # (dim_customers.sql:12-42: ROW_NUMBER ... WHERE rn=1 + ANY_VALUE + LEFT JOIN).
    p.materialized_view(
        "gold.dim_customers",
        comment="Customer dimension enriched with first-event telemetry.",
        table_properties={"quality": "gold", "layer": "analytics"},
        sql="""
WITH ranked_events AS (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM LIVE.silver_events
),
first_event AS (
  SELECT user_id,
         ANY_VALUE(value) AS first_event_value,
         ANY_VALUE(event_type) AS first_event_type
  FROM ranked_events
  WHERE rn = 1
  GROUP BY user_id
)
SELECT
  sha2(CAST(c.c_custkey AS STRING), 256) AS customer_key,
  c.c_custkey AS customer_natural_key,
  c.c_name,
  c.c_mktsegment,
  c.c_segment_display,
  c.c_nation_name,
  c.c_acctbal,
  fe.first_event_value,
  fe.first_event_type
FROM LIVE.silver_customer c
LEFT JOIN first_event fe
  ON c.c_custkey = fe.user_id
""",
    )

    # dim_suppliers — same geo-enrichment shape as dim_sellers.sql:12-38.
    p.materialized_view(
        "gold.dim_suppliers",
        comment="Supplier dimension enriched with first-event telemetry.",
        table_properties={"quality": "gold", "layer": "analytics"},
        sql="""
WITH ranked_events AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM LIVE.silver_events
),
first_event AS (
  SELECT user_id, ANY_VALUE(value) AS first_event_value
  FROM ranked_events
  WHERE rn = 1
  GROUP BY user_id
)
SELECT
  sha2(CAST(s.s_suppkey AS STRING), 256) AS supplier_key,
  s.s_suppkey AS supplier_natural_key,
  s.s_name,
  s.s_nation_name,
  s.s_acctbal,
  fe.first_event_value
FROM LIVE.silver_supplier s
LEFT JOIN first_event fe
  ON s.s_suppkey = fe.user_id
""",
    )

    # dim_parts — plain projection dim (dim_products.sql:12-27).
    p.materialized_view(
        "gold.dim_parts",
        comment="Part dimension.",
        table_properties={"quality": "gold", "layer": "analytics"},
        sql="""
SELECT
  sha2(CAST(p_partkey AS STRING), 256) AS part_key,
  p_partkey AS part_natural_key,
  p_name,
  p_brand,
  p_category,
  p_size,
  p_volume_index,
  p_is_premium,
  p_retailprice
FROM LIVE.silver_part
""",
    )

    # dim_date — generated calendar (dim_date.sql:13-40), but scale-safe:
    # sequence(min,max) instead of the reference's LIMIT-1000 ROW_NUMBER hack
    # (identical output semantics; SURVEY.md §7 step 3).
    p.materialized_view(
        "gold.dim_date",
        comment="Generated date dimension with calendar attributes.",
        table_properties={"quality": "gold", "layer": "analytics"},
        sql="""
WITH date_range AS (
  SELECT
    MIN(DATE(o_orderdate)) AS min_date,
    MAX(DATE(COALESCE(o_approved_at, o_orderdate))) AS max_date
  FROM LIVE.silver_orders
),
date_series AS (
  SELECT explode(sequence(min_date, max_date, INTERVAL 1 DAY)) AS date_day
  FROM date_range
)
SELECT
  ROW_NUMBER() OVER (ORDER BY date_day) AS date_key,
  date_day AS date_actual,
  EXTRACT(YEAR FROM date_day) AS year,
  EXTRACT(QUARTER FROM date_day) AS quarter,
  EXTRACT(MONTH FROM date_day) AS month,
  EXTRACT(DAY FROM date_day) AS day,
  EXTRACT(DAYOFWEEK FROM date_day) AS day_of_week,
  date_format(date_day, 'EEEE') AS day_name,
  date_format(date_day, 'MMMM') AS month_name,
  EXTRACT(WEEK FROM date_day) AS week_of_year,
  CASE WHEN EXTRACT(DAYOFWEEK FROM date_day) IN (1, 7) THEN TRUE ELSE FALSE END AS is_weekend
FROM date_series
""",
    )

    # fact_lineitem — the star fact (fact_order_items.sql:19-116): two
    # aggregate CTEs, 6-way inner star join, date-expression joins, left joins
    # to aggregates, fail-level constraints, liquid clustering.
    p.materialized_view(
        "gold.fact_lineitem",
        comment="Line-item fact with denormalized order/customer aggregates.",
        table_properties={"quality": "gold", "layer": "analytics"},
        cluster_by=("part_key", "supplier_key", "order_date_key", "customer_key"),
        expectations=[
            Expectation("fk_part", "part_key IS NOT NULL", "fail"),
            Expectation("fk_order", "order_key IS NOT NULL", "fail"),
            Expectation(
                "valid_item_price", "item_price IS NOT NULL AND item_price >= 0", "fail"
            ),
            Expectation(
                "valid_item_total", "item_total_value IS NOT NULL AND item_total_value >= 0", "warn"
            ),
            Expectation("valid_order_date", "order_date_key IS NOT NULL", "fail"),
        ],
        sql="""
WITH order_totals AS (
  SELECT
    l_orderkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_order_value,
    COUNT(DISTINCT l_returnflag) AS return_flag_count,
    MAX(l_quantity) AS max_item_quantity,
    array_join(sort_array(collect_set(l_returnflag)), ', ') AS return_flags
  FROM LIVE.silver_lineitem
  GROUP BY l_orderkey
),
event_summary AS (
  SELECT
    user_id,
    MAX(value) AS last_event_value,
    MAX(ts) AS last_event_ts
  FROM LIVE.silver_events
  GROUP BY user_id
)
SELECT
  sha2(concat(CAST(li.l_orderkey AS STRING), '|', CAST(li.l_linenumber AS STRING)), 256) AS lineitem_key,
  do.order_key,
  dc.customer_key,
  dp.part_key,
  ds.supplier_key,
  dd.date_key AS order_date_key,
  dd_ship.date_key AS ship_date_key,
  li.l_orderkey AS order_natural_key,
  li.l_linenumber,
  li.l_extendedprice AS item_price,
  li.l_extendedprice * li.l_discount AS item_discount_value,
  (COALESCE(li.l_extendedprice, 0) + COALESCE(li.l_tax, 0)) AS item_total_value,
  ot.total_order_value,
  ot.return_flag_count,
  ot.max_item_quantity,
  ot.return_flags,
  es.last_event_value,
  CASE WHEN es.last_event_value IS NOT NULL AND es.last_event_value >= 50 THEN TRUE ELSE FALSE END AS is_high_value_user,
  CASE WHEN li.l_shipdate IS NOT NULL
       THEN datediff(DATE(li.l_shipdate), DATE(o.o_orderdate))
       ELSE NULL END AS ship_lag_days,
  CASE WHEN o.o_approved_at IS NOT NULL
       THEN datediff(DATE(o.o_approved_at), DATE(o.o_orderdate))
       ELSE NULL END AS approval_lag_days,
  li.l_shipdate,
  o.o_orderdate AS order_purchase_timestamp
FROM LIVE.silver_lineitem li
INNER JOIN LIVE.silver_orders o
  ON li.l_orderkey = o.o_orderkey
INNER JOIN LIVE.silver_customer c
  ON o.o_custkey = c.c_custkey
INNER JOIN gold.dim_orders do
  ON o.o_orderkey = do.order_natural_key
INNER JOIN gold.dim_customers dc
  ON c.c_custkey = dc.customer_natural_key
INNER JOIN gold.dim_parts dp
  ON li.l_partkey = dp.part_natural_key
INNER JOIN gold.dim_suppliers ds
  ON li.l_suppkey = ds.supplier_natural_key
INNER JOIN gold.dim_date dd
  ON DATE(o.o_orderdate) = dd.date_actual
LEFT JOIN gold.dim_date dd_ship
  ON DATE(li.l_shipdate) = dd_ship.date_actual
LEFT JOIN order_totals ot
  ON li.l_orderkey = ot.l_orderkey
LEFT JOIN event_summary es
  ON o.o_custkey = es.user_id
WHERE li.l_orderkey IS NOT NULL
""",
    )
