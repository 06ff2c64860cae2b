-- Gold dedup-survivor corpus: one best document per order-insensitive
-- fingerprint group (highest quality_score, ties on lowest doc_id) — the
-- keep/drop decision an LLM training-data pipeline actually ships,
-- expressed in the reference's gold-MV idiom (CREATE OR REFRESH
-- MATERIALIZED VIEW + CONSTRAINT ... ON VIOLATION FAIL UPDATE + LIVE.
-- references, /root/reference/scripts/gold/fact_order_items.sql:1-19)
-- over the engine's corpus silver layer.
--
-- Scale: ONE hash exchange on fingerprint feeds both window functions
-- (ROW_NUMBER and the per-group COUNT share the partition spec) — no
-- second shuffle, no join back to the input. The n_copies COUNT window
-- blocks the WindowGroupLimit top-1 pushdown HERE (downstream consumers
-- that drop n_copies get it back via column pruning — corpus_mix does,
-- plan-guarded), and a hot fingerprint group sorts in one task; for
-- dup-heavy corpora the skew-immune production twin is
-- queries.py::q_corpus_survivors_agg (max_by aggregation, same oracle,
-- measured ~10x faster under a 50%-hot fingerprint — SCALING.md).
CREATE OR REFRESH MATERIALIZED VIEW gold.corpus_survivors
(
  CONSTRAINT survivor_doc_not_null EXPECT (doc_id IS NOT NULL) ON VIOLATION FAIL UPDATE,
  CONSTRAINT quality_in_unit_range EXPECT (quality_score >= 0.0 AND quality_score <= 1.0)
)
COMMENT "Deduplicated training-corpus survivors: best doc per fingerprint group."
TBLPROPERTIES (
  'quality' = 'gold',
  'layer' = 'corpus'
)
AS
WITH ranked AS (
  SELECT doc_id, source, predicted_lang, quality_score, bpe_tokens, fingerprint,
         ROW_NUMBER() OVER (PARTITION BY fingerprint
                            ORDER BY quality_score DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY fingerprint) AS n_copies
  FROM LIVE.corpus_docs
)
SELECT
  sha2(CAST(doc_id AS STRING), 256) AS doc_key,
  doc_id,
  source,
  predicted_lang,
  quality_score,
  bpe_tokens,
  fingerprint,
  CAST(n_copies AS BIGINT) AS n_copies
FROM ranked
WHERE rn = 1
