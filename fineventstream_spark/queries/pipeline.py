"""PL-family: training-data curation pipeline operators (round 2).

Beyond dedup/quality (queries/llm.py), a 100 TB pretraining pipeline needs
corpus *curation*: eval-set decontamination, deterministic sampling for
data mixing, domain-mix accounting, and quantile-based quality filtering.
The reference stops at ingest (its README's "Next Feats" list ends at
validation); these are the batch-analytics ops a user of that lake would
run next. All are expressed as pure DataFrame plans with DuckDB oracle
twins, so the driver hash-checks every one.

Scale notes (100 TB):
- decontamination shuffles once on the shingle hash (the join key); the
  eval side is tiny after DISTINCT and broadcasts.
- sampling is a stateless filter on a hash/modulus of the key — no
  shuffle, fully pushed into the scan stage, and reproducible across
  runs/cluster sizes (no RNG, no partition-order dependence).
- domain-mix is a two-level aggregation (per-domain partials, then a
  20-row window) — the window runs on the already-aggregated frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fineventstream_spark.catalog import Tables
from fineventstream_spark.registry import register

# Word n-gram size for decontamination. Real pipelines use 8-13-gram
# matching (e.g. the GPT-3 / PaLM decontamination recipes); the fixture
# docs are short, so 5 keeps a measurable overlap rate while still being
# a multi-word exact match.
_SHINGLE_K = 5


def word_shingles(text_col, k: int = _SHINGLE_K):
    """Array of word k-grams, JVM-side (single projection, no shuffle).

    A transform-over-sequence keeps shingle generation inside the scan
    stage: the alternative (posexplode + window lead) costs a full
    shuffle of every token in the corpus before the join even starts.
    """
    w = F.split(text_col, " ")
    n = F.size(w)
    idx = F.sequence(F.lit(1), n - (k - 1))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(k)])
    )
    return F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))


@register(
    "q_llm_decontaminate",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), shingles AS (
        SELECT doc_id,
               w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS sh
        FROM words, LATERAL (SELECT unnest(generate_series(1, len(w)-{_SHINGLE_K - 1})) AS i) t
    ), eval_sh AS (
        SELECT DISTINCT sh FROM shingles WHERE doc_id % 20 = 0
    ), train_sh AS (
        SELECT DISTINCT doc_id, sh FROM shingles WHERE doc_id % 20 <> 0
    )
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared_shingles
    FROM train_sh t JOIN eval_sh e USING (sh)
    GROUP BY t.doc_id
    """,
    tags=("PL1", "U5"),
)
def q_llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: flag training docs sharing any word
    5-gram with the held-out eval slice (doc_id % 20 == 0 plays the eval
    benchmark). One shuffle on the shingle; the distinct eval-shingle set
    is benchmark-sized → broadcast side of the join."""
    t = Tables(spark, sf_dir)
    sh = t.documents.select(
        "doc_id", F.explode(word_shingles(F.col("text"))).alias("sh")
    )
    eval_sh = sh.filter(F.col("doc_id") % 20 == 0).select("sh").distinct()
    train_sh = sh.filter(F.col("doc_id") % 20 != 0).distinct()
    return (
        train_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_shingles"))
    )


@register(
    "q_llm_sample_stratified",
    oracle="""
    SELECT d.lang, CAST(count(*) AS BIGINT) AS n_sampled, CAST(SUM(d.n_chars) AS BIGINT) AS chars_sampled
    FROM documents d
    JOIN (VALUES ('en', 3), ('de', 8), ('es', 10), ('fr', 5), ('zh', 1))
         AS r(lang, keep_lt) ON d.lang = r.lang
    WHERE d.doc_id % 10 < r.keep_lt
    GROUP BY d.lang
    """,
    tags=("PL2",),
)
def q_llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling for data mixing: per-language keep rates from a
    broadcast rates dim, membership decided by a key modulus — no RNG, so
    the sample is identical on any cluster size / run (sampleBy() is not:
    it draws per-partition). The filter collapses to a scan-stage
    predicate after the broadcast join."""
    t = Tables(spark, sf_dir)
    rates = spark.createDataFrame(
        [("en", 3), ("de", 8), ("es", 10), ("fr", 5), ("zh", 1)],
        "lang string, keep_lt int",
    )
    return (
        t.documents.join(F.broadcast(rates), "lang")
        .filter(F.col("doc_id") % 10 < F.col("keep_lt"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
        )
    )


@register(
    "q_llm_sample_hash",
    oracle="""
    SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS bucket_key
    FROM documents
    ORDER BY bucket_key, doc_id
    LIMIT 100
    """,
    tags=("PL3",),
)
def q_llm_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform deterministic sample: order by a portable content hash of
    the key and take the first N — reproducible across engines (md5 is
    bit-identical in Spark and DuckDB, unlike xxhash64) and across data
    layouts. Physically a TakeOrderedAndProject: per-partition top-N,
    single N-row merge on the driver — no global sort at 100 TB."""
    t = Tables(spark, sf_dir)
    return (
        t.documents.select(
            "doc_id",
            "source",
            F.md5(F.col("doc_id").cast("string").cast("binary")).alias("bucket_key"),
        )
        .orderBy("bucket_key", "doc_id")
        .limit(100)
    )


@register(
    "q_llm_domain_mix",
    oracle="""
    WITH per AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), 6) AS token_share,
           ROUND(CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, source) AS DOUBLE)
                 / SUM(n_tokens) OVER (), 6) AS cum_share
    FROM per
    """,
    tags=("PL4",),
)
def q_llm_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix accounting: token totals per source plus each domain's
    share and the cumulative share in descending-size order (the table a
    mixing-weights decision reads). The windows run over the 20-row
    aggregated frame, not the corpus."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    per = t.documents.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    total = Window.partitionBy()
    cum = Window.partitionBy().orderBy(F.col("n_tokens").desc(), F.col("source"))
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(total), 6).alias("token_share"),
        F.round(
            F.sum("n_tokens").over(cum) / F.sum("n_tokens").over(total), 6
        ).alias("cum_share"),
    )


@register(
    "q_llm_quality_quantile",
    oracle="""
    WITH parts AS (
        SELECT doc_id, source,
               length(text) AS n,
               string_split(lower(text), ' ') AS w,
               length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
        FROM documents
    ), derived AS (
        SELECT doc_id, source,
               LEAST(CAST(n AS DOUBLE) / 500.0, 1.0) AS len_score,
               LEAST(CAST(n_punct AS DOUBLE) / GREATEST(n, 1) * 5, 1.0) AS punct_penalty,
               CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
                   / GREATEST(len(w), 1) AS mwl
        FROM parts
    ), scored AS (
        SELECT doc_id, source,
               ROUND(0.5*len_score + 0.3*(1 - punct_penalty)
                     + 0.2*(CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END), 4) AS quality
        FROM derived
    ), tiled AS (
        SELECT doc_id, source, quality,
               NTILE(4) OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS q_tile
        FROM scored
    )
    SELECT doc_id, source, quality FROM tiled WHERE q_tile = 1
    """,
    tags=("PL5", "U7", "W1"),
)
def q_llm_quality_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile quality filter: keep each source's top quality quartile
    (ntile over a deterministic total order — score desc, then doc_id).
    Partitioned by source, so the sort is per-domain, not global; at
    100 TB the exact ntile would move to percentile_approx thresholds
    per source (one aggregation) — semantics identical at the boundary
    modulo ties, which the tiebreak pins here."""
    from pyspark.sql import Window

    from fineventstream_spark.operators.text import quality_score

    t = Tables(spark, sf_dir)
    scored = t.documents.select(
        "doc_id", "source", quality_score(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("source").orderBy(F.col("quality").desc(), F.col("doc_id"))
    return (
        scored.withColumn("q_tile", F.ntile(4).over(w))
        .filter(F.col("q_tile") == 1)
        .drop("q_tile")
    )
