"""Large-scale deduplication operators (LLM-data-pipeline extensions).

Beyond-parity operators for training-data pipelines (BASELINE.json north
star): exact dedup, token-fingerprint dedup, n-gram Jaccard near-dup,
MinHash+LSH near-dup, and SimHash near-dup — all expressed as JVM-side
DataFrame transformations (higher-order functions, no Python UDFs), so they
whole-stage-codegen and scale linearly with partitions.

Scale design notes (100 TB):
- Exact / fingerprint dedup: one hash-shuffle on the group key. The group key
  is a fixed-width digest (md5), so shuffle rows are small regardless of
  document size.
- MinHash LSH: cost is O(docs × shingles × hashes) map-side plus a shuffle
  keyed on (band_id, band_hash) — candidate pairs only materialize within a
  bucket, never the O(n²) cross join.
- SimHash: 64-bit fingerprint map-side, then a 4×16-bit banded self-join
  (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 bands identical).
- Brute-force Jaccard is provided as the small-scale oracle-checkable
  baseline; the banded variants are the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens_col(text_col: str = "text"):
    """Distinct lowercase whitespace tokens (the unit for set-similarity)."""
    return F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))


def fingerprint_col(text_col: str = "text"):
    """Order-insensitive document fingerprint: md5 of sorted distinct tokens.

    The OpenRefine-style "fingerprint" key: near-dups that permute/repeat
    words collapse to one key. A 32-hex digest keeps the dedup shuffle narrow.
    """
    return F.md5(F.array_join(F.array_sort(tokens_col(text_col)), " "))


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact duplicate groups: one hash-shuffle, keep min id per group."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def fingerprint_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token-fingerprint dedup groups over a corpus."""
    return (
        df.select(F.col(id_col), fingerprint_col(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingles(tokens, n: int):
    """Word n-gram shingles from a token array (JVM higher-order fns)."""
    return F.when(F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(tokens, i, n), " "),
        )
    ).otherwise(F.array(F.array_join(tokens, " ")))


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    ngram: int = 1,
) -> DataFrame:
    """Brute-force exact Jaccard near-dup pairs (O(n²) — baseline/oracle path).

    Token-set (ngram=1) or shingle-set (ngram>1) Jaccard. Use only on bounded
    inputs; the scale path is :func:`minhash_lsh_pairs`.
    """
    toks = tokens_col(text_col)
    sets = toks if ngram == 1 else F.array_distinct(_shingles(toks, ngram))
    t = df.select(F.col(id_col).alias("id"), sets.alias("s"))
    a = t.alias("a")
    b = t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    union = F.size(F.array_union(F.col("a.s"), F.col("b.s")))
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature(shingles, num_hashes: int = 64):
    """MinHash signature array over a shingle-array column/expression.

    ``sig[h] = min over shingles of murmur3(shingle, seed=h)`` — one pass,
    pure codegen (transform + array_min), no UDF. Pass a *column reference*
    to an already-projected shingle array (not the raw shingle expression):
    the lambda evaluates its input once per hash seed, and CollapseProject
    keeps a separate projection for the non-cheap shingle construction, so
    shingling runs once per document instead of ``num_hashes`` times.
    """
    return F.transform(
        F.sequence(F.lit(1), F.lit(num_hashes)),
        lambda s: F.array_min(F.transform(shingles, lambda x: F.hash(x, s))),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 60,
    bands: int = 10,
    ngram: int = 1,
    cache: bool = True,
) -> DataFrame:
    """MinHash + LSH near-dup pairs with exact-Jaccard verification.

    shingle → minhash → band → bucket-join → verify (SURVEY build plan §7.1
    step 7). Candidates come only from shared (band, band_hash) buckets, so
    the join is an equi-shuffle, not a cross join; each candidate pair is then
    verified with exact token-set Jaccard, so output ⊆ `jaccard_pairs` output
    (recall < 1 is the LSH tradeoff, precision = 1 after verification).

    Banding is tuned to the threshold: with ``r`` rows per band and ``b``
    bands the candidate S-curve midpoint sits at ``(1/b)^(1/r)`` — the
    default 10×6 puts it at 0.68 for ``threshold=0.8`` (a 16×4 layout would
    put it at 0.50 and admit ~4× more mid-similarity false candidates, which
    dominates runtime on corpora with many moderately-similar docs).
    Per-pair collision probability at j=0.8 is 1−(1−0.8⁶)¹⁰ ≈ 95%, and most
    true near-dups sit well above the threshold, so recall stays high.

    ``cache=True`` persists the compact ``(id, tokens, |tokens|, sig)``
    projection that every branch of the plan (banding, both sides of the
    self-join, estimate prefilter, exact verify) re-reads — without it the
    tokenizer and signature run up to 6× per action. The projection holds no
    raw text, so at corpus scale it is a small fraction of input size; pass
    ``cache=False`` to manage persistence at the pipeline level instead.

    Shuffle discipline (the 100 TB path): the banded self-join and the
    candidate dedup move only ``(id, band_id, band_hash)`` / ``(id_a, id_b)``
    rows — never token arrays. Candidates are then pre-screened with the
    *signature-estimated* Jaccard (matching positions / num_hashes) — the
    signatures are fixed-width int arrays, ~an order of magnitude narrower
    than token sets — and only survivors (estimate ≥ threshold − margin,
    margin ≈ 3σ of the Binomial(num_hashes, j) estimator, so <0.1% of true
    pairs are screened out) pay the wide token-array joins for exact
    verification. On a corpus with large duplicate clusters the false-positive
    candidates outnumber true pairs ~3:1, so the prefilter cuts the wide
    shuffle by that factor. Exact union size is derived as
    ``|A| + |B| − |A∩B|`` (sizes precomputed per doc) so verification runs
    one array_intersect per pair instead of intersect + union — and that
    intersect runs over xxhash64 *token hashes* (fixed-width bigints), not
    the token strings: set Jaccard is invariant under an injective map, and
    a 64-bit collision inside one document's token set is ~|tokens|²/2⁶⁵ —
    vanishing, and cross-checked by the exact-equality property test against
    the string-set :func:`jaccard_pairs`. Bigint arrays shuffle ~3× narrower
    and intersect without string hashing.
    """
    rows = num_hashes // bands
    margin = 3.0 * (threshold * (1.0 - threshold) / num_hashes) ** 0.5
    base = df.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("s"))
    shingled = base.select(
        "id",
        "s",
        (
            F.col("s")
            if ngram == 1
            else F.array_distinct(_shingles(F.col("s"), ngram))
        ).alias("sh"),
    )
    prepared = shingled.select(
        "id",
        F.transform("s", lambda x: F.xxhash64(x)).alias("hs"),
        F.size("s").alias("n"),
        minhash_signature(F.col("sh"), num_hashes).alias("sig"),
    )
    if cache:
        prepared = prepared.persist()
    sig = prepared.select("id", "sig")
    banded = sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda j: F.hash(F.array_join(F.slice("sig", j * rows + 1, rows), ",")),
            )
        ).alias("band_id", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ga = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    gb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("double") / F.lit(float(num_hashes))
    screened = (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .filter(est >= threshold - margin)
        .select("id_a", "id_b")
    )
    sa = prepared.select(
        F.col("id").alias("id_a"), F.col("hs").alias("s_a"), F.col("n").alias("n_a")
    )
    sb = prepared.select(
        F.col("id").alias("id_b"), F.col("hs").alias("s_b"), F.col("n").alias("n_b")
    )
    pairs = screened.join(sa, "id_a").join(sb, "id_b")
    inter = F.size(F.array_intersect("s_a", "s_b"))
    union = F.col("n_a") + F.col("n_b") - inter
    jac = F.round(inter.cast("double") / union.cast("double"), 6)
    return pairs.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def token_hashes(tokens_field: str):
    """One xxhash64 per token → array<bigint> (project this BEFORE simhash).

    Materializing the hash array in its own projection means the 64 bit-sum
    passes of :func:`simhash_expr` read a cheap attribute instead of
    re-hashing every token per bit position.
    """
    return F.expr(f"transform({tokens_field}, x -> xxhash64(x))")


def simhash_expr(hashes_field: str, bits: int = 64):
    """SimHash fingerprint as BIGINT over a pre-hashed array<bigint> column.

    Per bit position k: sum of ±1 over token hashes (+1 if bit k set);
    sign of the sum → bit k of the fingerprint. Written as a SQL
    higher-order-function expression because SQL ``shiftleft``/``shiftright``
    accept column shift amounts (the Python wrappers only take ints).

    Structure matters because higher-order functions are interpreted (no
    codegen): the hash array appears exactly once, as the *input* of the
    outer aggregate, so even after CollapseProject inlines the
    :func:`token_hashes` projection each token is hashed exactly once. (A
    k-outer formulation — 64 passes, each referencing the hash array inside
    the bit lambda — gets the hash transform inlined into every pass and
    re-hashes each token 64×, ~3× slower end-to-end.)
    """
    n = bits - 1
    return F.expr(
        f"""
        aggregate(
          zip_with(
            aggregate({hashes_field}, array_repeat(0, {bits}),
              (acc, h) -> zip_with(acc,
                sequence(0, {n}),
                (p, k) -> p + IF((shiftright(h, k) & 1) = 1, 1, -1))),
            sequence(0, {n}),
            (s, k) -> IF(s > 0, shiftleft(CAST(1 AS BIGINT), k), CAST(0 AS BIGINT))),
          CAST(0 AS BIGINT), (a, b) -> a + b)
        """
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs via 4×16-bit banded self-join + bit_count verify.

    Pigeonhole: hamming(fp_a, fp_b) ≤ 3 ⇒ at least one of the 4 16-bit bands
    is identical, so banding loses no true pairs while keeping the join an
    equi-shuffle.
    """
    base = (
        df.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("__toks"))
        .select("id", token_hashes("__toks").alias("__hs"))
        .select("id", simhash_expr("__hs").alias("fp"))
    )
    banded = base.select(
        "id",
        "fp",
        F.posexplode(
            F.expr("transform(sequence(0, 3), j -> shiftright(fp, j * 16) & 65535)")
        ).alias("band_id", "band_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
