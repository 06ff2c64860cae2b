-- Part dimension — plain projection dim, the
-- /root/reference/scripts/gold/dim_products.sql:12-27 shape.
CREATE OR REFRESH MATERIALIZED VIEW gold.dim_parts

COMMENT "Part dimension."
TBLPROPERTIES (
  'quality' = 'gold',
  'layer' = 'analytics'
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
