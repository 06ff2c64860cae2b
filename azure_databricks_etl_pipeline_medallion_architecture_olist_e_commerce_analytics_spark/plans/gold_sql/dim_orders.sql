-- Order dimension: deterministic surrogate key + delivery-KPI flags.
-- Re-expresses /root/reference/scripts/gold/dim_orders.sql:12-37 on the
-- driver testdata (orders → orders role mapping, FIXTURES.md §B).
CREATE OR REFRESH MATERIALIZED VIEW gold.dim_orders

COMMENT "Order dimension with deterministic surrogate keys and KPIs."
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
