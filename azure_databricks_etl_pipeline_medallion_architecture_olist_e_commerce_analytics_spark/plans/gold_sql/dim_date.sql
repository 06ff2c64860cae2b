-- Generated date dimension (/root/reference/scripts/gold/dim_date.sql:13-40),
-- but scale-safe: sequence(min,max) + explode instead of the reference's
-- LIMIT-1000 ROW_NUMBER hack — identical output semantics (SURVEY.md §7.2).
CREATE OR REFRESH MATERIALIZED VIEW gold.dim_date

COMMENT "Generated date dimension with calendar attributes."
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
