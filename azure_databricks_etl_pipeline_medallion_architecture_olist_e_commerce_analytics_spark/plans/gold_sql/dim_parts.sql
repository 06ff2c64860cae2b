-- Part dimension — plain projection dim, the
-- /root/reference/scripts/gold/dim_products.sql:12-27 shape.
CREATE OR REFRESH MATERIALIZED VIEW gold.dim_parts

COMMENT "Part dimension."
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
