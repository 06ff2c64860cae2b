-- The star fact (/root/reference/scripts/gold/fact_order_items.sql:1-116):
-- fail-level constraints, liquid clustering keys, two aggregate CTEs, 6-way
-- inner star join, date-expression joins, left joins to aggregates.
CREATE OR REFRESH MATERIALIZED VIEW gold.fact_lineitem
(
  CONSTRAINT fk_part          EXPECT (part_key IS NOT NULL)                                        ON VIOLATION FAIL UPDATE,
  CONSTRAINT fk_order         EXPECT (order_key IS NOT NULL)                                       ON VIOLATION FAIL UPDATE,
  CONSTRAINT valid_item_price EXPECT (item_price IS NOT NULL AND item_price >= 0)                  ON VIOLATION FAIL UPDATE,
  CONSTRAINT valid_item_total EXPECT (item_total_value IS NOT NULL AND item_total_value >= 0),
  CONSTRAINT valid_order_date EXPECT (order_date_key IS NOT NULL)                                  ON VIOLATION FAIL UPDATE
)
CLUSTER BY (part_key, supplier_key, order_date_key, customer_key)
COMMENT "Line-item fact with denormalized order/customer aggregates."
TBLPROPERTIES (
  'quality' = 'gold',
  'layer' = 'analytics',
  -- reference write tuning (fact_order_items.sql:11-18): applied when
  -- the sink runs with Delta jars; inert under the parquet fallback
  'delta.autoOptimize.optimizeWrite' = 'true',
  'delta.autoOptimize.autoCompact' = 'true',
  'delta.enableDeletionVectors' = 'true',
  'delta.targetFileSize' = '268435456'
)
AS
WITH order_totals_sets AS (
  -- COUNT(DISTINCT) derived from the collect_set built in the same pass
  -- (size of the null-skipping distinct set == count distinct) — avoids the
  -- Expand + extra aggregation phase of Spark's distinct rewrite.
  SELECT
    l_orderkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_order_value,
    MAX(l_quantity) AS max_item_quantity,
    sort_array(collect_set(l_returnflag)) AS _flags
  FROM LIVE.silver_lineitem
  GROUP BY l_orderkey
),
order_totals AS (
  SELECT
    l_orderkey,
    total_order_value,
    CAST(size(_flags) AS BIGINT) AS return_flag_count,
    max_item_quantity,
    array_join(_flags, ', ') AS return_flags
  FROM order_totals_sets
),
event_summary AS (
  SELECT
    user_id,
    MAX(value) AS last_event_value,
    MAX(ts) AS last_event_ts
  FROM LIVE.silver_events
  GROUP BY user_id
)
-- Join strategy (sf1 plan audit, round 3): the chain is ordered so each of
-- the fact's two hash partitionings is paid ONCE and reused — first the
-- orderkey chain (orders, order_totals, dim_orders: all keyed by the order
-- key, so the aggregate's shuffle partitioning carries through two more
-- joins with only sorts), then the custkey chain (customer + dim_customers,
-- one exchange serving both; dim_customers is customer-cardinality and must
-- NOT broadcast at scale), then the genuinely small dims as explicit
-- broadcasts (Catalyst's stats mispriced dim_suppliers — ~1k rows — into a
-- full-fact SortMergeJoin exchange, and conversely auto-broadcast the
-- order-cardinality dim_orders, ~110 MB at sf1 and unbounded at 100 TB;
-- the hints pin both the right way). event_summary aggregates to distinct
-- users and broadcasts.
-- (no hint on the order_totals CTE: a join-strategy hint naming a CTE
-- alias trips Spark's InlineCTE.buildCTEMap on some write plans
-- ("key not found" NoSuchElementException); its join needs no hint anyway —
-- both sides are already hash-partitioned on the order key)
-- Round-10: the two non-broadcast joins are SHUFFLE_HASH, not MERGE —
-- same exchanges, but the per-partition hash build replaces BOTH sides'
-- sorts (guide §3.1: prefer shuffled-hash when the build side fits per
-- partition). Build sides are dim_orders/dim_customers slices: exactly
-- one row per join key (no build-side skew possible), and AQE's advisory
-- partition sizing keeps per-partition builds small in the common case.
-- Caveat: unlike SMJ, the SHJ build side does NOT spill — AQE coalesces
-- small partitions but cannot shrink a genuinely large one, so at extreme
-- per-partition build sizes this trades the old sort's spill safety for
-- speed; if a deployment hits executor OOM here, drop the hint (output is
-- identical either way — the hint is pure physical strategy).
-- Measured at sf0.1: 3.67 -> 3.05 s, bitwise-identical output.
-- Round-11: silver_customer (c) joined the SHUFFLE_HASH list — it was the
-- one remaining SortMergeJoin, sorting the full fact chain AND the
-- customer slice on o_custkey/c_custkey before the custkey-chain exchange
-- that dc already reuses. Build side is one row per c_custkey (same
-- no-skew argument as dc); the per-partition build is a customer-slice
-- partition, same size class as the dc build next to it, so the spill
-- caveat above covers it unchanged. Plan: SMJ 1 -> 0, both sorts gone;
-- sf0.1 interleaved A/B min 3.30 -> 3.03 s, median 3.75 -> 3.50.
SELECT /*+ BROADCAST(dp, ds, dd, dd_ship, es), SHUFFLE_HASH(do, dc, c) */
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
LEFT JOIN order_totals ot
  ON li.l_orderkey = ot.l_orderkey
INNER JOIN gold.dim_orders do
  ON o.o_orderkey = do.order_natural_key
INNER JOIN LIVE.silver_customer c
  ON o.o_custkey = c.c_custkey
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
LEFT JOIN event_summary es
  ON o.o_custkey = es.user_id
WHERE li.l_orderkey IS NOT NULL
