"""Text primitives shared by the dedup / text-analysis operators.

Everything here is engine-neutral on purpose: each Spark column builder
has a DuckDB SQL twin (the *_SQL snippets) computing bit-identical
values, so the dedup/textstat queries are oracle-checkable end to end.
The portable 32-bit hash is the first 8 hex digits of md5 — both
engines lower 64-bit-safe integer arithmetic onto it for minhash /
simhash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: hash universe for the minhash permutations.
MH_PRIME = 2147483647
# Fixed (a, b) affine-permutation constants; k = 8 hashes -> 4 bands of 2.
MH_COEFS = [
    (1000003, 12345),
    (1000033, 54321),
    (1000037, 98765),
    (1000039, 192837),
    (1000081, 777777),
    (1000099, 31415926),
    (1000117, 2718281),
    (1000121, 14142135),
]
SIMHASH_BITS = 16


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (trim first so no empty edge tokens)."""
    return F.split(F.trim(text), r"\s+")


def hash32(col: Column) -> Column:
    """Portable 32-bit string hash: int(md5[:8], 16). DuckDB twin:
    CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct word-3-gram shingles per document:
    (doc_id, sh string, h bigint).

    Entirely shuffle-free: duplicate shingles can only occur within one
    document, so the dedup is a row-local `array_distinct` on the
    shingle array before the explode — never a cluster-wide distinct.
    At 100 TB this keeps every fuzzy-dedup pass at one narrow map stage
    until its own groupBy.
    """
    toks = docs.select("doc_id", tokens_col(F.col(text_col)).alias("t")).filter(
        F.size("t") >= 3
    )
    sh = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 3),
                    lambda i: F.concat_ws(
                        " ", F.col("t")[i], F.col("t")[i + 1], F.col("t")[i + 2]
                    ),
                )
            )
        ).alias("sh"),
    )
    return sh.withColumn("h", hash32(F.col("sh")) % MH_PRIME)


# DuckDB twin of shingles(): CTEs over a `documents`-shaped relation.
SHINGLES_SQL = """
tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
idx AS (
  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM tok WHERE len(t) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh FROM idx
),
shh AS (
  SELECT doc_id, sh,
         CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) % 2147483647 AS h
  FROM sh
)
"""


def normalized_text(text: Column) -> Column:
    """Canonical form for exact-dup fingerprinting: lowercase, collapse
    whitespace, trim. DuckDB twin: trim(regexp_replace(lower(x),
    '\\s+', ' ', 'g'))."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
