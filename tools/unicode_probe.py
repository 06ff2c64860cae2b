"""Adversarial-unicode text parity probe: the text-operator family must
stay VALUE-IDENTICAL to its DuckDB oracles when documents carry emoji,
CJK, RTL scripts, combining accents, and exotic whitespace.

The sf* corpora are ASCII-ish; a 100 TB crawl is not. Both engines claim
unicode-aware `lower`/`length`/regex — this probe checks that the exact
expressions the oracles rely on (`\\s+` splits, `[A-Za-z]` classes,
codepoint lengths, md5-of-utf8) agree on hostile text, value-by-value.

Determinism: doc_id % 5 picks one of five adversarial suffixes appended to
the original text; doc_id % 7 == 0 additionally prepends exotic whitespace.

Usage: python tools/unicode_probe.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

OUT = "/tmp/spark_graft_unicode/sf0.001"
SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Five adversarial families: emoji (incl. ZWJ sequence + surrogate pairs),
# CJK (no spaces), RTL Arabic/Hebrew, Latin with combining accents (NFD),
# and mixed digits/symbols with full-width forms.
SUFFIXES = [
    " café café straße ẞ",  # NFC vs NFD accents, ß/ẞ
    " \U0001f600\U0001f9d1‍\U0001f4bb\U0001f1e7\U0001f1f7 emoji",  # ZWJ + flags
    " 中文文本没有空格 tokens",  # CJK run
    " مرحبا שלום rtl",  # Arabic+Hebrew
    " １２３ ＡＢＣ full－width",  # full-width forms
]
EXOTIC_WS = "  　"  # nbsp, em-space, ideographic space

# The text-operator family whose oracles replicate tokenization/length/
# hash expressions (queries over other tables are unaffected by text).
TEXT_QUERIES = [
    "text_analysis",
    "dedup_exact",
    "dedup_fingerprint",
    "top_ngrams",
    "tf_idf",
    "token_entropy",
    "token_diversity",
    "zipf_head_share",
    "corpus_rarity",
    "oov_rate",
    "explode_tokens",
    "quality_filter",
    "lm_perplexity",
    "lm_perplexity_pruned",
    "winnow_fingerprints",
    "corpus_silver_docs",
    "corpus_gold_survivors",
    "corpus_gold_mix",
    "corpus_survivors_agg",
    "leakage_safe_split",
    "budget_select",
    "bpe_pairs",
    "bpe_merges",
    "bpe_encode",
    "bm25_rank",
    "doc_chunking",
    "pii_scan",
    "containment_dedup",
    "winnow_fingerprints",
    "token_drift",
    "kl_divergence_sources",
    "mutual_information",
    "source_overlap",
    "bigram_lm_counts",
    "collocation_pmi",
    "repetition_quality",
    "feature_hashing",
    "substring_dedup",
    "substring_dedup_hashed",
    "substring_trim",
    "preference_pairs",
    "keyword_textrank",
    "jaccard_prefix_join",
    "cms_topk",
]


def build() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(OUT, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "documents":
            ids = tbl.column("doc_id").to_pylist()
            texts = tbl.column("text").to_pylist()
            new_texts = []
            for i, txt in zip(ids, texts):
                s = (txt or "") + SUFFIXES[int(i) % 5]
                if int(i) % 7 == 0:
                    s = EXOTIC_WS + s
                new_texts.append(s)
            arrays = {name: tbl.column(name) for name in tbl.column_names}
            arrays["text"] = pa.array(new_texts, type=pa.string())
            # n_chars intentionally kept as the ORIGINAL length: operators
            # must derive lengths from text, not trust stale metadata
            tbl = pa.table(arrays)
        pq.write_table(tbl, f"{OUT}/{t}.parquet")


def main() -> int:
    import duckdb

    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark import (
        get_spark,
    )
    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (
        ORACLES,
        SPARK_QUERIES,
    )
    from oracle_utils import compare_frames

    if not os.path.exists(f"{OUT}/documents.parquet"):
        build()
    only = set(sys.argv[1:])
    spark = get_spark("unicode-probe")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{OUT}/{t}.parquet')"
        )
    failures = []
    for name in TEXT_QUERIES:
        if only and name not in only:
            continue
        try:
            got = SPARK_QUERIES[name](spark, OUT).toPandas()
            want = con.execute(ORACLES[name]).fetchdf()
            problems = compare_frames(got, want, name)
            if problems:
                failures.extend(problems)
                print(f"FAIL {name}: {problems[0][:220]}", flush=True)
            else:
                print(f"ok   {name} ({len(got)} rows)", flush=True)
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:200]}")
            print(f"ERR  {name}: {type(exc).__name__}: {str(exc)[:160]}", flush=True)
    print(f"\n=== {len(failures)} failures ===")
    for f in failures:
        print(f[:300])
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
