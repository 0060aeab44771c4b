"""Training-dataset preparation operators over the documents table.

The north-star pipeline (BASELINE.json) needs more than dedup before a
corpus is trainable: benchmark decontamination, denylist scrubbing,
intra-document repetition filtering, mixture re-sampling, and the
dataset-card summary that documents what shipped. Each one here is a
DataFrame-in/DataFrame-out query with a DuckDB oracle.

Shapes chosen for 100 TB:
- every per-doc score (repetition, scrub counts, split/mixture
  assignment) is row-local column math — a narrow map stage, no
  shuffle until the caller aggregates;
- decontamination joins train shingles against the *benchmark's*
  distinct shingles; with a real eval set that side is tiny and
  broadcastable, and the join key is the shingle STRING (the 32-bit
  int hash would collide at corpus scale);
- split/mixture assignment is a content-stable md5-bucket hash, not
  RNG: reproducible across engines/runs and stable under
  repartitioning, so downstream stages can recompute membership
  instead of joining against a stored assignment table.

Reference parity: the reference has no LLM-pipeline stage (SURVEY §2B
"absent" rows); these extend the engine per the task's north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from adcirctime2cogs_spark.functions.numeric import r4
from adcirctime2cogs_spark.functions.text import (
    SHINGLES_SQL,
    hash32,
    tokens_col,
)
from adcirctime2cogs_spark.tables import load_table

QUERIES = {}
ORACLES = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Content-stable bucket in [0, m): int(md5(prefix || doc_id)[:8], 16) % m.
# The prefix domain-separates independent uses (split vs mixture) so the
# same doc doesn't land in correlated buckets across decisions.
def _bucket(prefix: str, m: int):
    return hash32(F.concat(F.lit(prefix), F.col("doc_id").cast("string"))) % m


def _bucket_sql(prefix: str, m: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('{prefix}' || CAST(doc_id AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {m}"
    )


@_register(
    "prep_decontaminate",
    "WITH "
    + SHINGLES_SQL
    + f""",
    b AS (SELECT doc_id, {_bucket_sql('', 100)} AS bucket FROM documents),
    tr AS (SELECT s.doc_id, s.sh FROM sh s JOIN b ON s.doc_id = b.doc_id
           WHERE b.bucket < 80),
    te AS (SELECT DISTINCT s.sh FROM sh s JOIN b ON s.doc_id = b.doc_id
           WHERE b.bucket >= 90)
    SELECT tr.doc_id, count(*) AS n_contaminated
    FROM tr JOIN te ON tr.sh = te.sh
    GROUP BY tr.doc_id
    """,
)
def prep_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train-split docs sharing >=1 word-3-gram
    shingle with any test-split doc, with the count of distinct shared
    shingles. The test side reduces to its distinct shingle set before
    the join — with a real eval benchmark that set is tiny (broadcast);
    the join key is the shingle string, never the lossy int hash."""
    docs = load_table(spark, sf_dir, "documents")
    # Reuse dedup's MEMOIZED shingle table (mtime-keyed, evicted on
    # in-place fixture regeneration) instead of persisting a second
    # copy here: an untracked persist of the identical plan would be
    # the entry CacheManager re-serves STALE after dedup's eviction,
    # and it was never unpersisted.
    from adcirctime2cogs_spark.operators.dedup import _shingle_artifacts

    sh_full, _stop, _inter = _shingle_artifacts(spark, sf_dir)
    sh = sh_full.select("doc_id", "sh")
    split = docs.select("doc_id", _bucket("", 100).alias("bucket"))
    train_sh = sh.join(split.filter(F.col("bucket") < 80), "doc_id").select(
        "doc_id", "sh"
    )
    test_sh = (
        sh.join(split.filter(F.col("bucket") >= 90), "doc_id")
        .select("sh")
        .distinct()
    )
    return (
        train_sh.join(test_sh, "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )


_DENYLIST_PAT = r"\b(key|hash|window)\b"


@_register(
    "prep_denylist_scrub",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_DENYLIST_PAT}')) AS n_hits,
           md5(trim(regexp_replace(
             regexp_replace(text, '{_DENYLIST_PAT}', '', 'g'),
             '\\s+', ' ', 'g'))) AS clean_fp
    FROM documents
    """,
)
def prep_denylist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denylist scrubbing (the C4-style bad-term pass; same machinery as
    PII redaction with an email/phone pattern): per-doc hit count plus a
    digest of the scrubbed, whitespace-collapsed text so the oracle
    checks full content parity, not just counts. Row-local — one narrow
    map stage at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _DENYLIST_PAT, ""), r"\s+", " "
        )
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_DENYLIST_PAT), 0)).alias(
            "n_hits"
        ),
        F.md5(cleaned).alias("clean_fp"),
    )


@_register(
    "prep_repetition_filter",
    """
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    idx AS (
      SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
      FROM tok WHERE len(t) >= 3
    )
    SELECT doc_id,
           count(*) AS n_shingles,
           count(DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS n_distinct,
           round(1.0 - count(DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                 / count(*), 4) AS rep_ratio
    FROM idx
    GROUP BY doc_id
    """,
)
def prep_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition score: 1 - distinct/total word-3-grams.
    Boilerplate- and loop-heavy docs score high and get filtered before
    training. Entirely row-local (array arithmetic on the token array —
    no explode, no shuffle), unlike the corpus-wide dedup family."""
    docs = load_table(spark, sf_dir, "documents")
    t = tokens_col(F.col("text"))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - 3),
        lambda i: F.concat_ws(" ", t[i], t[i + 1], t[i + 2]),
    )
    n_total = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    return (
        docs.filter(F.size(t) >= 3)
        .select(
            "doc_id",
            n_total.cast("bigint").alias("n_shingles"),
            n_distinct.cast("bigint").alias("n_distinct"),
            r4(1.0 - n_distinct / n_total).alias("rep_ratio"),
        )
    )


@_register(
    "prep_quality_filter",
    """
    WITH t AS (
      SELECT doc_id, n_chars,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))
               AS n_punct,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                 x -> x IN ('the', 'a', 'and', 'of'))) AS n_stop
      FROM documents
    ),
    g AS (
      SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
            FROM documents)
      WHERE len(t) >= 3
    ),
    r AS (
      SELECT doc_id,
             1.0 - count(DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   * 1.0 / count(*) AS rep
      FROM g GROUP BY doc_id
    ),
    s AS (
      SELECT t.doc_id, t.n_tokens,
             coalesce(r.rep, 0.0) AS rep,
             least(t.n_tokens / 100.0, 1.0) * 0.5
               + (1.0 - t.n_punct * 1.0 / t.n_chars) * 0.3
               + least(t.n_stop * 5.0 / t.n_tokens, 1.0) * 0.2 AS q
      FROM t LEFT JOIN r ON t.doc_id = r.doc_id
    )
    SELECT doc_id, n_tokens, round(rep, 4) AS rep_ratio, round(q, 4) AS quality,
           CASE WHEN n_tokens < 20 THEN 'too_short'
                WHEN n_tokens > 5000 THEN 'too_long'
                WHEN rep > 0.05 THEN 'repetitive'
                WHEN q < 0.45 THEN 'low_quality'
                ELSE 'ok' END AS reason,
           (CASE WHEN n_tokens < 20 THEN 'too_short'
                WHEN n_tokens > 5000 THEN 'too_long'
                WHEN rep > 0.05 THEN 'repetitive'
                WHEN q < 0.45 THEN 'low_quality'
                ELSE 'ok' END) = 'ok' AS keep
    FROM s
    """,
)
def prep_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite keep/drop decision (C4-style): length bounds,
    intra-doc 3-gram repetition, and the heuristic quality score folded
    into one verdict with the first failing rule as the reason. All
    signals are row-local column math over the token array, so the
    whole filter is one narrow map stage — the oracle's join between
    its CTEs is a DuckDB artifact, not a plan requirement."""
    return quality_verdict(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens", "rep_ratio", "quality", "reason", "keep"
    )


def quality_verdict(docs: DataFrame) -> DataFrame:
    """DataFrame-level quality kernel shared by the registered query
    and corpus_pipeline: the input columns passed through, plus
    (n_tokens, rep_ratio, quality, reason, keep) from row-local
    column math only. The score columns come from textstats'
    quality_feature_cols — the ONE definition of the heuristic, so a
    tuning edit cannot desync this verdict from the registered
    text_quality score (review r11)."""
    from adcirctime2cogs_spark.operators.textstats import (
        quality_feature_cols,
    )

    toks, n, _n_punct, _n_stop, q = quality_feature_cols()
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(" ", toks[i], toks[i + 1], toks[i + 2]),
    )
    rep = F.when(
        n >= 3, 1.0 - F.size(F.array_distinct(grams)) * 1.0 / F.size(grams)
    ).otherwise(F.lit(0.0))
    reason = (
        F.when(n < 20, "too_short")
        .when(n > 5000, "too_long")
        .when(rep > 0.05, "repetitive")
        .when(q < 0.45, "low_quality")
        .otherwise("ok")
    )
    return docs.select(
        "*",
        n.cast("bigint").alias("n_tokens"),
        r4(rep).alias("rep_ratio"),
        r4(q).alias("quality"),
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


# Target per-language sampling rates in permille: downsample the
# dominant language, keep the rest whole (the mixture-rebalancing move).
_MIX_RATES = {"en": 500, "de": 1000, "es": 1000, "fr": 1000, "zh": 1000}


@_register(
    "prep_mixture_sample",
    f"""
    WITH r AS (
      SELECT doc_id, lang,
             CASE lang WHEN 'en' THEN 500 ELSE 1000 END AS rate,
             {_bucket_sql('mix:', 1000)} AS bucket
      FROM documents
    )
    SELECT doc_id, lang, round(1000.0 / rate, 4) AS weight
    FROM r WHERE bucket < rate
    """,
)
def prep_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture re-sampling: keep each doc iff its
    domain-separated hash bucket falls under the language's target rate,
    and emit the inverse-rate weight so downstream stats stay unbiased.
    Hash-threshold sampling (not RNG) means membership is recomputable
    by any engine and stable under repartitioning. Languages outside
    _MIX_RATES default to 1000 (keep whole) — without the coalesce a
    new language would get a NULL rate and be silently dropped,
    diverging from the documented keep-the-rest-whole semantics."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in _MIX_RATES.items() for x in kv]
            ),
            F.col("lang"),
        ),
        F.lit(1000),
    )
    return (
        docs.select(
            "doc_id", "lang", rate.alias("rate"), _bucket("mix:", 1000).alias("b")
        )
        .filter(F.col("b") < F.col("rate"))
        .select("doc_id", "lang", r4(1000.0 / F.col("rate")).alias("weight"))
    )


# Minority-language replication factors — the opposite move of
# _MIX_RATES' dominant-language downsampling; languages absent here
# keep a single copy.
_OVERSAMPLE_REPS = {"de": 3, "fr": 2}

_REPS_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _OVERSAMPLE_REPS.items())
    + " ELSE 1 END"
)


@_register(
    "prep_oversample",
    f"""
    SELECT doc_id, lang,
           CAST(unnest(range({_REPS_CASE})) AS BIGINT) AS copy_idx,
           round(1.0 / ({_REPS_CASE}), 4) AS weight
    FROM documents
    """,
)
def prep_oversample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic minority-class oversampling, the complement of
    prep_mixture_sample's downsampling: each doc of an oversampled
    language is replicated k times ((doc_id, copy_idx) rows, so
    downstream shuffles/packing treat every copy as its own example)
    with the inverse-replication weight that keeps weighted corpus
    statistics unbiased. Row-local sequence fan-out — no RNG, no
    shuffle, identical output under any partitioning; at 100 TB the
    fan-out happens inside the scan's projection, never as a join."""
    docs = load_table(spark, sf_dir, "documents")
    k = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in _OVERSAMPLE_REPS.items() for x in kv]
            ),
            F.col("lang"),
        ),
        F.lit(1),
    ).cast("bigint")
    return docs.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(0).cast("bigint"), k - 1)).alias(
            "copy_idx"
        ),
        r4(1.0 / k).alias("weight"),
    )


@_register(
    "prep_dataset_card",
    f"""
    WITH b AS (
      SELECT *, {_bucket_sql('', 100)} AS bucket FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid'
                ELSE 'test' END AS split,
           lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
             AS n_tokens,
           count(DISTINCT source) AS n_sources,
           round(avg(n_chars), 4) AS avg_chars
    FROM b
    GROUP BY 1, 2
    """,
)
def prep_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary: per split x language doc/token/source
    counts. The split is recomputed inline from the same stable hash as
    text_train_test_split — no assignment-table join — so the card is
    one scan + one partial+final aggregate at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = _bucket("", 100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        docs.select(
            split.alias("split"),
            "lang",
            "source",
            "n_chars",
            F.size(tokens_col(F.col("text"))).alias("n_tok"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.countDistinct("source").alias("n_sources"),
            r4(F.avg("n_chars")).alias("avg_chars"),
        )
    )


CHUNK_W = 200  # chunk window (chars)
CHUNK_S = 150  # chunk stride (chars) -> 50-char overlap


@_register(
    "prep_chunk_windows",
    f"""
    WITH d AS (
      SELECT doc_id, text,
             CAST((greatest(length(text) - {CHUNK_W}, 0) + {CHUNK_S} - 1)
                  // {CHUNK_S} AS BIGINT) + 1 AS n_chunks
      FROM documents
    ),
    e AS (
      SELECT doc_id, text, n_chunks,
             unnest(generate_series(CAST(0 AS BIGINT), n_chunks - 1))
               AS chunk_idx
      FROM d
    )
    SELECT doc_id, chunk_idx, n_chunks,
           substr(text, chunk_idx * {CHUNK_S} + 1, {CHUNK_W}) AS chunk_text
    FROM e
    """,
)
def prep_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking: each document splits into
    CHUNK_W-char windows at CHUNK_S stride (50-char overlap) — the
    retrieval/pretraining chunker. Pure row-local explode: sequence +
    substring, no shuffle at all; at 100 TB this is a map-only stage
    whose output feeds the shard sink. Chunk count is integer-exact in
    both engines: 1 + ceil(max(len - W, 0) / S)."""
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = (
        F.expr(
            f"(greatest(length(text) - {CHUNK_W}, 0) + {CHUNK_S} - 1)"
            f" div {CHUNK_S}"
        )
        + 1
    ).cast("bigint")
    return (
        docs.select("doc_id", "text", n_chunks.alias("n_chunks"))
        .select(
            "doc_id",
            "n_chunks",
            F.explode(F.sequence(F.lit(0).cast("bigint"),
                                 F.col("n_chunks") - 1)).alias("chunk_idx"),
            "text",
        )
        .select(
            "doc_id",
            "chunk_idx",
            "n_chunks",
            F.substring(
                "text", F.col("chunk_idx") * CHUNK_S + 1, CHUNK_W
            ).alias("chunk_text"),
        )
    )


SHUF_SEED = 20260814  # deterministic training-order seed
SHUF_MULT = 2654435761  # Knuth multiplicative hash
SHUF_MOD = 1 << 32
N_SHARDS = 64


# sort_key = (doc_id * MULT + SEED) mod 2^32, computed overflow-free:
# a direct doc_id * 2654435761 exceeds BIGINT for doc_id >= ~3.47e9
# (ANSI Spark throws, DuckDB errors — exactly the multi-billion-doc
# regime the operator exists for), so the 32-bit residue is multiplied
# in 16-bit halves: every intermediate stays under 2^49. Mathematically
# identical to the direct form, so fixture-scale sort keys are
# byte-for-byte unchanged.
_SHUF_KEY_SQL = (
    f"((((doc_id % {SHUF_MOD}) // 65536) * {SHUF_MULT} % {SHUF_MOD}) * 65536"
    f" + ((doc_id % {SHUF_MOD}) % 65536) * {SHUF_MULT}"
    f" + {SHUF_SEED}) % {SHUF_MOD}"
)


@_register(
    "prep_seeded_shuffle",
    f"""
    SELECT doc_id,
           {_SHUF_KEY_SQL} AS sort_key,
           ({_SHUF_KEY_SQL}) % {N_SHARDS} AS shard
    FROM documents
    """,
)
def prep_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded global shuffle for training order: each doc
    gets a multiplicative-hash sort key and a shard assignment —
    reproducible across engines/runs (no RNG state) and stable under
    repartitioning. The scalable shuffle contract at 100 TB: write
    shard files partitioned by `shard`, sorted by `sort_key` within
    each shard (sortWithinPartitions on the shard sink); a global
    row_number would serialize on one partition and is deliberately
    NOT offered. Pure projection — zero shuffle in this plan. The
    split-multiply key form is overflow-safe to doc_id = 2^63-1 (see
    _SHUF_KEY_SQL)."""
    docs = load_table(spark, sf_dir, "documents")
    d32 = F.pmod(F.col("doc_id"), F.lit(SHUF_MOD))
    hi = F.shiftright(d32, 16)
    lo = d32.bitwiseAND(F.lit(0xFFFF))
    key = (
        (hi * SHUF_MULT % SHUF_MOD) * 65536 + lo * SHUF_MULT + SHUF_SEED
    ) % SHUF_MOD
    return docs.select(
        "doc_id",
        key.alias("sort_key"),
        (key % N_SHARDS).alias("shard"),
    )


SOURCE_CAP = 8  # max docs kept per source
_CAP_SALTS = 4  # phase-1 fan-out for the skew-safe two-phase top-N


@_register(
    "prep_source_cap",
    f"""
    SELECT source, doc_id, n_chars, rk FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents
    ) WHERE rk <= {SOURCE_CAP}
    """,
)
def prep_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (domain) cap: keep at most SOURCE_CAP docs per
    source, preferring longer documents — the standard corpus-prep
    guard against a single crawl domain dominating the training mix.

    The naive form is one row_number window partitioned by source —
    but at 100 TB a hot domain (half the corpus from one host) makes
    that a single-task sort of billions of rows. This runs the
    skew-safe two-phase top-N instead: phase 1 partitions each source
    into _CAP_SALTS deterministic salt groups (doc_id % salts — no RNG,
    stable under recompute) and takes the top SOURCE_CAP within each
    (source, salt); phase 2 re-ranks the ≤ salts×cap survivors per
    source. The second window's per-key input is bounded by
    salts×cap = 32 rows REGARDLESS of domain skew, and phase 1's
    parallelism scales with the salt count. Ordering (n_chars DESC,
    doc_id) is total, so the final ranks match the naive form exactly
    — which is what the oracle runs."""
    return source_cap_keepers(
        load_table(spark, sf_dir, "documents").select(
            "source", "doc_id", "n_chars"
        )
    )


def source_cap_keepers(
    docs: DataFrame, cap: int = SOURCE_CAP, salts: int = _CAP_SALTS
) -> DataFrame:
    """DataFrame-level skew-safe per-source top-N kernel shared by the
    registered query (fixture-calibrated cap=8) and corpus_pipeline
    (cap from config); expects (source, doc_id, n_chars) columns,
    returns the kept rows with their final rank."""
    order = (F.col("n_chars").desc(), F.col("doc_id"))
    w1 = W.partitionBy("source", "salt").orderBy(*order)
    phase1 = (
        docs.withColumn("salt", F.col("doc_id") % salts)
        .withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= cap)
    )
    w2 = W.partitionBy("source").orderBy(*order)
    return (
        phase1.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= cap)
        .select("source", "doc_id", "n_chars", "rk")
    )


# ------------------------------------------------ DSIR importance
DSIR_BUCKETS = 1024  # hashed-unigram feature space


_DSIR_SQL = f"""
WITH b AS (
  SELECT doc_id, text, {_bucket_sql('', 100)} AS bucket FROM documents
),
tk AS (
  SELECT doc_id, bucket,
         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
           % {DSIR_BUCKETS} AS feat
  FROM (
    SELECT doc_id, bucket,
           unnest(string_split_regex(trim(text), '\\s+')) AS tok
    FROM b
  )
),
fc AS (
  SELECT feat,
         CAST(sum(CASE WHEN bucket >= 90 THEN 1 ELSE 0 END) AS BIGINT)
           AS ct,
         CAST(sum(CASE WHEN bucket < 90 THEN 1 ELSE 0 END) AS BIGINT)
           AS cr
  FROM tk GROUP BY feat
),
tot AS (
  SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr
  FROM fc
),
lr AS (
  SELECT feat,
         ln((ct + 1.0) / (nt + {DSIR_BUCKETS}.0))
           - ln((cr + 1.0) / (nr + {DSIR_BUCKETS}.0)) AS logratio
  FROM fc CROSS JOIN tot
)
SELECT tk.doc_id,
       CAST(count(*) AS BIGINT) AS n_feats,
       round(sum(logratio), 4) AS dsir_logw
FROM tk JOIN lr USING (feat)
WHERE tk.bucket < 90
GROUP BY tk.doc_id
"""


@_register("prep_dsir_weights", _DSIR_SQL)
def prep_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al.,
    NeurIPS'23) weights: score every raw-pool document by how much
    more likely its hashed-unigram features are under the TARGET
    distribution than under the raw pool — the standard recipe for
    steering a web-scale corpus toward a target domain. Target here =
    the held-out eval bucket (the same content-stable md5 split every
    prep query uses); features = unigram hashes into DSIR_BUCKETS
    cells; both LMs are add-1 smoothed; a doc's log-weight is the sum
    of its token occurrences' log-ratios (the unigram-LM view, with
    multiplicity). Emits (doc_id, n_feats, dsir_logw); resampling =
    ORDER BY dsir_logw + Gumbel noise at the caller.

    Scale shape: the feature COUNTS come from one groupBy with
    conditional partial aggregates (target and raw distributions in a
    single aggregation, never one scan per side); the feature table
    is at most DSIR_BUCKETS rows, so the totals fold into a
    single-row cross join and the per-doc scoring join BROADCASTS the
    feature table back onto the token stream — corpus-sized data
    SHUFFLES exactly once (the per-doc sum). The tokenize+hash
    projection itself is evaluated twice (once under the aggregate,
    once under the scoring join — both narrow map work over the same
    scan); a 100 TB run would checkpoint the token table between the
    two, the corpus_pipeline stage-materialization pattern.

    The documents scan is SPREAD (optimization r13, measured 1.358 ->
    1.112 s same-session A/B, rows identical): the tokenize+hash
    projection runs twice over the scan and is the query's dominant
    cost, and the per-doc log-ratio groups are bounded by document
    length (never scale-growing), so partitioning cannot move the
    rounded sum off its value. Identity on well-split tables."""
    from adcirctime2cogs_spark.tables import load_table_spread

    docs = load_table_spread(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id",
        _bucket("", 100).alias("bucket"),
        F.explode(tokens_col(F.col("text"))).alias("tok"),
    ).select(
        "doc_id", "bucket",
        (hash32(F.col("tok")) % DSIR_BUCKETS).alias("feat"),
    )
    fc = tk.groupBy("feat").agg(
        F.sum((F.col("bucket") >= 90).cast("long")).alias("ct"),
        F.sum((F.col("bucket") < 90).cast("long")).alias("cr"),
    )
    tot = fc.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    lr = fc.crossJoin(F.broadcast(tot)).select(
        "feat",
        (
            F.log((F.col("ct") + 1.0) / (F.col("nt") + float(DSIR_BUCKETS)))
            - F.log((F.col("cr") + 1.0) / (F.col("nr") + float(DSIR_BUCKETS)))
        ).alias("logratio"),
    )
    return (
        tk.filter(F.col("bucket") < 90)
        .join(F.broadcast(lr), "feat")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            r4(F.sum("logratio")).alias("dsir_logw"),
        )
    )


# ------------------------------------------------------------------
# Token-budget source mixing — how production mixtures are actually
# specified: each domain gets a TOKEN budget (not a doc-count cap or
# a sampling rate), and docs fill it in a deterministic pseudo-random
# order until the budget is crossed. Complements prep_mixture_sample
# (hash-rate thinning) and prep_source_cap (doc-count cap).
# Registered as prep_token_budget_mix in round 11 (registry queue);
# _TOKEN_BUDGET_SQL is the oracle, parity pinned in
# tests/test_dataprep.py.

TOKEN_BUDGET = 1500   # tokens per source (fixture-calibrated: keeps
                      # a nontrivial strict subset at every SF)
_MIX_SALTS = 8

_TOKEN_BUDGET_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS hk
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY hk, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cb
  FROM t
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cb AS BIGINT) AS cum_before
FROM c WHERE cb < {TOKEN_BUDGET}
"""


def token_budget_keepers(docs: DataFrame,
                         budget: int = TOKEN_BUDGET,
                         salts: int = _MIX_SALTS) -> DataFrame:
    """Keep each source's deterministic-hash-order prefix of documents
    whose tokens-so-far (exclusive) are under `budget` — every source
    contributes at least one doc, and the kept token mass first
    crosses the budget on its last doc. Returns (doc_id, source,
    n_tokens, cum_before).

    Skew shape (the prep_source_cap discipline): a naive per-source
    running sum makes a hot domain one giant sorted task, so phase 1
    computes the running sum within (source, doc_id % salts) groups
    and drops docs whose LOCAL prefix already exceeds the budget —
    sound because a doc's global prefix sum is >= its salt-local one
    (the global hash order interleaves the salt groups) — and phase 2
    re-runs the exact window over the survivors, whose count per
    source is bounded by ~salts * budget/avg_tokens regardless of
    domain size. Ordering (md5(doc_id), doc_id) is total, so the
    result equals the naive single-window form — which is what the
    oracle runs."""
    t = docs.select(
        "doc_id", "source",
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
        F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8"))
        .alias("hk"),
        F.pmod("doc_id", F.lit(salts)).alias("salt"),
    )
    w_local = (
        W.partitionBy("source", "salt")
        .orderBy("hk", "doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    phase1 = t.withColumn(
        "lcb", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    ).filter(F.col("lcb") < budget)
    w_glob = (
        W.partitionBy("source")
        .orderBy("hk", "doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        phase1.withColumn(
            "cum_before",
            F.coalesce(F.sum("n_tokens").over(w_glob), F.lit(0)),
        )
        .filter(F.col("cum_before") < budget)
        .select("doc_id", "source", "n_tokens", "cum_before")
    )


@_register("prep_token_budget_mix", _TOKEN_BUDGET_SQL)
def prep_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query shape of token_budget_keepers over the
    documents table (per-source token-budget mixture fill).
    Registered in round 11 per the rotation queue noted in
    registry.py — built and DuckDB-parity-pinned since round 10
    (tests/test_dataprep.py)."""
    return token_budget_keepers(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Split-leakage audit (r13 queue, with the CUSUM/KS detectors: built +
# oracle ready, NOT registered).

def _leakage_sql() -> str:
    from adcirctime2cogs_spark.operators.dedup import (
        _INTER_SQL,
        _SIZES_SQL,
    )

    return (
        "WITH "
        + SHINGLES_SQL
        + _INTER_SQL
        + _SIZES_SQL
        + """,
pairs AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8
),
sp AS (
  SELECT doc_id,
         CASE WHEN b < 80 THEN 'train'
              WHEN b < 90 THEN 'valid'
              ELSE 'test' END AS split
  FROM (
    SELECT doc_id,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                AS BIGINT) % 100 AS b
    FROM documents
  )
)
SELECT least(a.split, b.split) AS split_a,
       greatest(a.split, b.split) AS split_b,
       count(*) AS n_pairs,
       CAST(least(a.split, b.split) != greatest(a.split, b.split)
            AS BIGINT) AS leaky
FROM pairs
JOIN sp a ON a.doc_id = doc_a
JOIN sp b ON b.doc_id = doc_b
GROUP BY 1, 2
"""
    )


@_register("prep_split_leakage_audit", _leakage_sql())
def prep_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-leakage audit of the content-hash split: count exact-
    Jaccard near-dup pairs (the dedup_ngram_jaccard miner, j >= 0.8)
    by the split classes of their two members. A pair straddling
    train and valid/test IS leakage — the eval member has a near-copy
    in training, the contamination mode per-doc decontamination can't
    see because no eval shingle list exists for the corpus's OWN
    held-out split. Output: (split_a, split_b, n_pairs, leaky) with
    the pair class canonicalized least/greatest; leaky = 1 on
    off-diagonal classes. The remedy this audit motivates is grouping
    near-dup components onto one side of the split before training
    (the consumer pattern documented in corpus_pipeline).

    Composition, not reimplementation: the pair set is the registered
    dedup_ngram_jaccard's (shared shingle artifacts, DF_CAP stop
    discipline) and the split rule is the registered
    text_train_test_split's md5-bucket hash — the audit cannot drift
    from what it audits.

    100 TB shape: the pair graph is the capped posting-list join
    (sub-quadratic); split assignment is row-local hash math joined
    onto the pair ends by doc_id; the final agg is 6 groups.

    Reference parity: none — north-star dataset-prep family,
    BASELINE.json."""
    from adcirctime2cogs_spark.operators.dedup import dedup_ngram_jaccard
    from adcirctime2cogs_spark.operators.textstats import (
        text_train_test_split,
    )

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    splits = text_train_test_split(spark, sf_dir).select("doc_id", "split")
    a = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
    )
    b = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
    )
    cls_a = F.least("sa", "sb")
    cls_b = F.greatest("sa", "sb")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .groupBy(cls_a.alias("split_a"), cls_b.alias("split_b"))
        .agg(F.count("*").alias("n_pairs"))
        .select(
            "split_a",
            "split_b",
            "n_pairs",
            (F.col("split_a") != F.col("split_b"))
            .cast("bigint")
            .alias("leaky"),
        )
    )
