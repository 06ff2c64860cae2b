-- Gold corpus-mixture MV: post-dedup document/token counts per
-- (source, predicted language) with each cell's share of total tokens —
-- the mixture table a pretraining-data pipeline reads to set sampling
-- weights. Demonstrates a gold→gold dependency (reads the survivors MV),
-- the same LIVE-reference mechanism the reference uses between layers
-- (/root/reference/scripts/gold/fact_order_items.sql:28).
--
-- Scale: the global-token window runs over the AGGREGATED cells
-- (|sources| × |languages| rows), never the raw corpus; the groupBy is one
-- map-side-combined hash aggregate over the survivors table.
CREATE OR REFRESH MATERIALIZED VIEW gold.corpus_mix
COMMENT "Post-dedup corpus mixture: docs/tokens per (source, language) with token share."
TBLPROPERTIES (
  'quality' = 'gold',
  'layer' = 'corpus'
)
AS
SELECT
  source,
  predicted_lang,
  COUNT(*) AS n_docs,
  CAST(SUM(bpe_tokens) AS BIGINT) AS total_tokens,
  -- a zero-token corpus has no mixture: NULL, spelled out because Spark's
  -- 0.0/0.0 is NULL while DuckDB's is NaN (the time_weighted_avg guard)
  CASE WHEN COALESCE(SUM(SUM(bpe_tokens)) OVER (), 0) = 0 THEN NULL
       ELSE ROUND(CAST(SUM(bpe_tokens) AS DOUBLE)
                  / CAST(SUM(SUM(bpe_tokens)) OVER () AS DOUBLE), 6)
  END AS token_share
FROM LIVE.corpus_survivors
GROUP BY source, predicted_lang
