-- Customer dimension enriched via window-dedup subquery — the
-- ROW_NUMBER ... WHERE rn = 1 + ANY_VALUE + LEFT JOIN shape of
-- /root/reference/scripts/gold/dim_customers.sql:12-42.
CREATE OR REFRESH MATERIALIZED VIEW gold.dim_customers

COMMENT "Customer dimension enriched with first-event telemetry."
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
