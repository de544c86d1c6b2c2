"""Deduplication operators for large-scale training-data pipelines.

Four families, all deterministic (no eval-time RNG — hashes are seeded by
construction so re-runs and retried tasks agree):

- exact:        hash-groupBy on content (or sha256 for wide payloads)
- MinHash+LSH:  shingle → K minhashes → B bands → bucket-join candidates
- SimHash:      64-bit near-dup fingerprint, bucket by rotated prefixes
- n-gram Jaccard: exact verify on LSH candidate pairs only

Scale design (100 TB): the only shuffles are (a) the band-bucket groupBy,
whose payload is (band_hash → doc_id, signature) — tiny vs the corpus, and
(b) the final candidate-pair join-back. The O(n²) trap (all-pairs compare)
is structurally avoided: pairs are only formed within an LSH bucket, and
oversized buckets (degenerate content) are capped. Everything up to the
bucket groupBy is JVM built-ins inside one codegen stage — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Large prime < 2^31 keeps rolling-hash arithmetic inside exact long range
# even under ANSI overflow checking.
_MOD = 2_147_483_647


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep one row per distinct content value (the lowest id wins —
    deterministic, unlike dropDuplicates' partition-order winner)."""
    w = Window.partitionBy(content_col).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles(words_col, n: int = 3):
    """Word n-gram shingle array from a words array column (JVM-side)."""
    return F.when(
        F.size(words_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words_col) - (n - 1)),
            lambda i: F.array_join(F.slice(words_col, i, n), " "),
        ),
    ).otherwise(F.array(F.array_join(words_col, " ")))


def minhash_signature(shingle_col, num_hashes: int = 64):
    """Array of ``num_hashes`` min-hashes over the shingle set.

    Each "permutation" is xxhash64 with a distinct seed constant mixed in;
    array_min(transform(...)) keeps the whole signature computation inside
    whole-stage codegen.
    """
    def _minhash(k: int):
        # closure (not a default arg — that would switch PySpark to the
        # two-arg (element, index) lambda variant)
        return F.array_min(
            F.transform(shingle_col, lambda s: F.xxhash64(F.concat(F.lit(f"mh{k}:"), s)))
        )

    return F.array(*[_minhash(k) for k in range(num_hashes)])


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int = 50,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash-LSH banding.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated across
    bands. ``est_jaccard`` is the signature agreement fraction — an unbiased
    estimate of true Jaccard similarity of the shingle sets.

    Buckets larger than ``max_bucket`` are dropped (degenerate/boilerplate
    content): at 100 TB a single hot bucket would otherwise produce a
    quadratic pair explosion on one executor.
    """
    rows_per_band = num_hashes // bands
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(shingles(words, shingle_n), num_hashes).alias("sig"),
    )

    band_entries = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # Pair formation within buckets; cap bucket size to bound the blow-up.
    bucket_counts = band_entries.groupBy("band", "bucket").agg(F.count("*").alias("bsz"))
    capped = band_entries.join(
        F.broadcast(bucket_counts.filter(F.col("bsz") > 1).filter(F.col("bsz") <= max_bucket)),
        ["band", "bucket"],
    )
    a = capped.select("band", "bucket", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = capped.select("band", "bucket", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(agree / F.lit(float(64 if num_hashes == 64 else num_hashes)), 4).alias("est_jaccard"),
    )


def ngram_jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only (never all-pairs).

    Joins the texts back by id (two hash joins on the small candidate set)
    and computes |A∩B| / |A∪B| over distinct shingles with built-ins.
    """
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    sh = df.select(
        F.col(id_col).alias("id"), F.array_distinct(shingles(words, shingle_n)).alias("sh")
    )
    out = (
        candidates.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return out.select(
        "id_a",
        "id_b",
        F.round(inter / union, 4).alias("jaccard"),
    )


# SimHash as a SQL fold: for each bit position, set the bit when more than
# half the token hashes have it set (majority vote). SQL lambdas allow
# shiftleft with a column shift amount, which the Python API does not.
_SIMHASH_SQL = """
aggregate(
  sequence(0, 63),
  cast(0 as bigint),
  (acc, i) -> acc + CASE
      WHEN size(filter(__hashes, h -> (h & shiftleft(cast(1 as bigint), i)) != 0)) * 2
           > size(__hashes)
      THEN shiftleft(cast(1 as bigint), i)
      ELSE cast(0 as bigint) END
)
"""


def with_simhash64(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    """Attach a 64-bit SimHash of the text — pure built-ins, deterministic,
    codegen-friendly (no Python in the loop)."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    return (
        df.withColumn("__hashes", F.transform(words, lambda w: F.xxhash64(w)))
        .withColumn(out_col, F.expr(_SIMHASH_SQL))
        .drop("__hashes")
    )


def simhash_candidates(df: DataFrame, text_col: str, id_col: str, prefix_bits: int = 16) -> DataFrame:
    """Near-dup candidates: equal SimHash prefix buckets (4 rotations so any
    pair within Hamming distance ~3 shares at least one bucket w.h.p.)."""
    sh = with_simhash64(df, text_col).select(F.col(id_col).alias("id"), "simhash")
    rotations = [0, 16, 32, 48]
    bucketed = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("rot"),
                        F.shiftrightunsigned(
                            # rotate left by r then take the top prefix_bits
                            F.shiftleft("simhash", r).bitwiseOR(
                                F.shiftrightunsigned("simhash", 64 - r) if r else F.lit(0).cast("long")
                            ),
                            64 - prefix_bits,
                        ).alias("bucket"),
                    )
                    for r in rotations
                ]
            )
        ).alias("rb"),
    ).select("id", "simhash", F.col("rb.rot").alias("rot"), F.col("rb.bucket").alias("bucket"))
    a = bucketed.select("rot", "bucket", F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = bucketed.select("rot", "bucket", F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["rot", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", hamming.cast("int").alias("hamming"))
    )
