-- Supplier dimension, same geo-enrichment shape as
-- /root/reference/scripts/gold/dim_sellers.sql:12-38.
CREATE OR REFRESH MATERIALIZED VIEW gold.dim_suppliers

COMMENT "Supplier dimension enriched with first-event telemetry."
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
