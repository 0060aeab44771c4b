"""Behavior pins for the dataset-prep family beyond the oracle gate:
determinism, proportions, and a local Python recomputation of the
denylist scrub for one document."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from adcirctime2cogs_spark.operators.dataprep import (
    _DENYLIST_PAT,
    prep_dataset_card,
    prep_denylist_scrub,
    prep_mixture_sample,
    prep_repetition_filter,
)
from adcirctime2cogs_spark.operators.textstats import text_train_test_split
from adcirctime2cogs_spark.tables import load_table


def test_split_is_deterministic_and_exhaustive(spark, sf_dir):
    a = {r.doc_id: r.split for r in text_train_test_split(spark, sf_dir).collect()}
    b = {r.doc_id: r.split for r in text_train_test_split(spark, sf_dir).collect()}
    assert a == b
    n = len(a)
    assert n == load_table(spark, sf_dir, "documents").count()
    # hash buckets approximate 80/10/10; generous bounds at small n
    frac_train = sum(1 for s in a.values() if s == "train") / n
    assert 0.65 <= frac_train <= 0.95
    assert set(a.values()) <= {"train", "valid", "test"}


def test_mixture_sample_downsamples_dominant_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    before = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = prep_mixture_sample(spark, sf_dir)
    after = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # non-en languages are kept whole (rate 1000/1000)
    for lang, n in before.items():
        if lang != "en":
            assert after.get(lang) == n
    # en is hash-thresholded at 50% — allow wide small-n variance
    assert 0.25 * before["en"] <= after.get("en", 0) <= 0.75 * before["en"]
    # weights are the inverse rate
    ws = {r.lang: r.weight for r in kept.select("lang", "weight").distinct().collect()}
    assert ws["en"] == 2.0
    assert all(w == 1.0 for lang, w in ws.items() if lang != "en")


def test_denylist_scrub_matches_local_recompute(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    row = docs.orderBy("doc_id").limit(1).collect()[0]
    got = (
        prep_denylist_scrub(spark, sf_dir)
        .filter(F.col("doc_id") == row.doc_id)
        .collect()[0]
    )
    hits = re.findall(_DENYLIST_PAT, row.text)
    cleaned = re.sub(r"\s+", " ", re.sub(_DENYLIST_PAT, "", row.text)).strip()
    assert got.n_hits == len(hits)
    assert got.clean_fp == hashlib.md5(cleaned.encode()).hexdigest()


def test_repetition_ratio_bounds(spark, sf_dir):
    rows = prep_repetition_filter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.rep_ratio <= 1.0
        assert r.n_distinct <= r.n_shingles


def test_quality_filter_verdict_consistency(spark, sf_dir):
    from adcirctime2cogs_spark.operators.dataprep import prep_quality_filter

    rows = prep_quality_filter(spark, sf_dir).collect()
    assert rows
    valid = {"ok", "too_short", "too_long", "repetitive", "low_quality"}
    for r in rows:
        assert r.reason in valid
        assert r.keep == (r.reason == "ok")
        assert 0.0 <= r.rep_ratio <= 1.0
        if r.reason == "too_short":
            assert r.n_tokens < 20


def test_dataset_card_totals(spark, sf_dir):
    card = prep_dataset_card(spark, sf_dir)
    total = card.agg(F.sum("n_docs")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "documents").count()


def test_survivors_partition_the_corpus(spark, sf_dir):
    from adcirctime2cogs_spark.operators.dedup import dedup_components, dedup_survivors

    surv = dedup_survivors(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    # clusters (singletons included) partition the corpus exactly
    assert sum(r.cluster_size for r in surv) == n_docs
    comp = {r.doc_id: r.component for r in dedup_components(spark, sf_dir).collect()}
    chars = {
        r.doc_id: r.n_chars
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    }
    for r in surv:
        # keeper belongs to its own cluster and is the longest member
        assert comp.get(r.keeper, r.keeper) == r.component
        members = [d for d, c in comp.items() if c == r.component] or [r.component]
        assert chars[r.keeper] == max(chars[d] for d in members)


def test_chunk_windows_edges(spark, tmp_path):
    """Chunking must be total: empty text -> one empty chunk, text at
    exactly the window size -> one chunk, text one char past the
    stride boundary -> extra chunk with the 50-char overlap intact."""
    from adcirctime2cogs_spark.operators.dataprep import (
        CHUNK_S,
        CHUNK_W,
        prep_chunk_windows,
    )

    docs = [
        (0, "", "en", "s", 0),
        (1, "x" * CHUNK_W, "en", "s", CHUNK_W),
        (2, "a" * (CHUNK_W + 1), "en", "s", CHUNK_W + 1),
        (3, "b" * (CHUNK_W + CHUNK_S), "en", "s", CHUNK_W + CHUNK_S),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = prep_chunk_windows(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r
    assert len(by_doc[0]) == 1 and by_doc[0][0].chunk_text == ""
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == "x" * CHUNK_W
    assert len(by_doc[2]) == 2
    # second chunk starts at the stride, overlapping the first by W-S
    assert by_doc[2][1].chunk_text == "a" * (CHUNK_W + 1 - CHUNK_S)
    assert len(by_doc[3]) == 2
    assert by_doc[3][1].chunk_text == "b" * CHUNK_W
    # every chunk records the doc's total chunk count
    for d, chunks in by_doc.items():
        for r in chunks.values():
            assert r.n_chunks == len(chunks)


def test_seeded_shuffle_properties(spark, sf_dir):
    """The seeded shuffle is a bijection on sort keys (multiplicative
    hash is odd -> injective mod 2^32), shard-bounded, and stable
    across invocations."""
    from adcirctime2cogs_spark.operators.dataprep import (
        N_SHARDS,
        prep_seeded_shuffle,
    )

    rows = prep_seeded_shuffle(spark, sf_dir).collect()
    keys = [r.sort_key for r in rows]
    assert len(set(keys)) == len(keys)  # injective on doc_ids
    assert all(0 <= r.shard < N_SHARDS for r in rows)
    again = prep_seeded_shuffle(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_bpe_train_matches_reference_python(spark, sf_dir):
    """Distributed BPE training equals a straight pure-Python Sennrich
    implementation on the same word histogram: identical merge table
    (ranks, pairs, counts) — the iterative-loop analogue of the
    k-means==numpy pin."""
    from collections import Counter

    from adcirctime2cogs_spark.functions.text import tokens_col
    from adcirctime2cogs_spark.operators.textstats import (
        BPE_MERGES,
        text_bpe_train,
    )
    from adcirctime2cogs_spark.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    rows = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("w"))
        .filter((F.length("w") >= 2) & (F.length("w") <= 20))
        .groupBy("w").count().collect()
    )
    vocab = {tuple(r.w): r["count"] for r in rows}

    expected = []
    for rank in range(BPE_MERGES):
        pairs = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        # tie-break (count desc, left, right) — the operator's contract
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rank, left, right, n))
        new_vocab = {}
        for syms, cnt in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            key = tuple(res)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab

    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in text_bpe_train(spark, sf_dir).orderBy("rank").collect()
    ]
    assert got == expected


def test_bpe_train_survives_fully_merged_words(spark, tmp_path):
    """Regression: a word whose symbols fully merge into ONE symbol
    (here 'ab' after round-1's ('a','b') merge) must not crash later
    rounds — sequence(1, size-1) on a 1-element array is [1, 0] in
    Spark (descending!) and indexed syms[1] out of bounds before the
    size>=2 guard existed."""
    from adcirctime2cogs_spark.operators.textstats import text_bpe_train

    rows = [(i, "ab ab ab cdef", "en", "s", 13) for i in range(30)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = text_bpe_train(spark, str(tmp_path)).orderBy("rank").collect()
    assert out  # did not crash
    # round 1 merges the dominant pair (a,b); 'ab' is then one symbol
    assert (out[0].left, out[0].right) == ("a", "b")
    # later merges come from the surviving multi-symbol word 'cdef'
    assert all((r.left, r.right) != ("a", "b") for r in out[1:])


def test_bpe_encode_matches_reference_python(spark, sf_dir):
    """The distributed encoder equals per-doc pure-Python encoding with
    the same merge table: identical (n_words, n_syms, n_bpe_tokens)
    for every doc, plus the structural invariants (tokens never exceed
    symbols; merges strictly shrink docs containing learned pairs)."""
    from adcirctime2cogs_spark.operators.textstats import (
        bpe_encode_word,
        bpe_merge_ranks,
        java_ws_tokens,
        text_bpe_encode,
    )
    from adcirctime2cogs_spark.tables import load_table

    ranks = bpe_merge_ranks(spark, sf_dir)
    assert ranks  # training produced merges
    # Java-\s+ parity: NBSP/em-space are NOT token separators (the JVM
    # training pass keeps them inside a token), plain spaces/tabs are
    assert java_ws_tokens("foo bar baz\tqux") == [
        "foo bar", "baz", "qux"
    ]
    got = {
        r.doc_id: (r.n_words, r.n_syms, r.n_bpe_tokens)
        for r in text_bpe_encode(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    assert len(got) == len(docs)
    shrunk = 0
    for row in docs:
        words = [w for w in java_ws_tokens(row.text) if 2 <= len(w) <= 20]
        n_syms = sum(len(w) for w in words)
        n_bpe = sum(len(bpe_encode_word(w, ranks)) for w in words)
        assert got[row.doc_id] == (len(words), n_syms, n_bpe), row.doc_id
        assert n_bpe <= n_syms
        shrunk += n_bpe < n_syms
    assert shrunk > 0  # the learned merges actually fire on the corpus


def test_bpe_encode_word_rank_greedy_order():
    """Encoding applies the LOWEST-rank merge first regardless of text
    order — the property that distinguishes BPE encode from a naive
    left-to-right replacement."""
    from adcirctime2cogs_spark.operators.textstats import bpe_encode_word

    # rank 0: ('b','c'); rank 1: ('a','b') — 'abc' must become a + bc
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert bpe_encode_word("abc", ranks) == ["a", "bc"]
    # chained merges: ('a','b') then ('ab','c')
    ranks = {("a", "b"): 0, ("ab", "c"): 1}
    assert bpe_encode_word("abcabc", ranks) == ["abc", "abc"]
    # no applicable merge: identity
    assert bpe_encode_word("xyz", {("q", "r"): 0}) == ["x", "y", "z"]


def test_oversample_weighted_stats_unbiased(spark, sf_dir):
    """Oversampling must be invisible to weighted statistics: per
    language, sum(weight) over the replicated rows equals the original
    doc count exactly (weights are r4(1/k) with k copies — bounded
    rounding, so compare to 4dp), copy_idx enumerates 0..k-1 per doc,
    and languages outside _OVERSAMPLE_REPS keep exactly one copy."""
    from pyspark.sql import functions as F

    from adcirctime2cogs_spark.operators.dataprep import (
        _OVERSAMPLE_REPS,
        prep_oversample,
    )
    from adcirctime2cogs_spark.tables import load_table

    out = prep_oversample(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    orig = {r.lang: r.n for r in docs.groupBy("lang").count()
            .withColumnRenamed("count", "n").collect()}
    got = {
        r.lang: (r.rows, r.w, r.max_idx)
        for r in out.groupBy("lang")
        .agg(
            F.count("*").alias("rows"),
            F.sum("weight").alias("w"),
            F.max("copy_idx").alias("max_idx"),
        )
        .collect()
    }
    assert set(got) == set(orig)
    for lang, n in orig.items():
        k = _OVERSAMPLE_REPS.get(lang, 1)
        rows, w, max_idx = got[lang]
        assert rows == n * k
        assert max_idx == k - 1
        assert abs(w - n) < 1e-4 * rows + 1e-9


def test_dsir_weights_invariants(spark, sf_dir):
    """DSIR weights: exactly the raw-pool (bucket < 90) docs are
    scored, n_feats equals each doc's token count (occurrences, not
    distinct — the unigram-LM view), and every weight is finite. The
    ratio's numeric definition is pinned by the full-formula DuckDB
    oracle in the parity sweep."""
    from pyspark.sql import functions as F

    from adcirctime2cogs_spark.operators.dataprep import (
        _bucket,
        prep_dsir_weights,
    )
    from adcirctime2cogs_spark.functions.text import tokens_col
    from adcirctime2cogs_spark.tables import load_table

    out = prep_dsir_weights(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    raw_ids = {
        r.doc_id
        for r in docs.select("doc_id", _bucket("", 100).alias("b"))
        .filter("b < 90").collect()
    }
    rows = out.collect()
    assert {r.doc_id for r in rows} == raw_ids
    tok_counts = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(tokens_col(F.col("text"))).alias("n")
        ).collect()
    }
    import math

    for r in rows:
        assert r.n_feats == tok_counts[r.doc_id]
        assert math.isfinite(r.dsir_logw)


def test_text_nb_classify_is_a_proper_posterior_argmax(spark, sf_dir):
    """Multinomial-NB invariants: one prediction per document, the
    predicted class is a class observed in training, every log-score
    is negative (it's a log joint of probabilities < 1), and the
    argmax really beats a hand-recomputed score for a competing class
    on a sampled doc (pinning the smoothing arithmetic, not just
    shapes)."""
    import math
    from collections import Counter

    from adcirctime2cogs_spark.operators.textstats import text_nb_classify

    out = text_nb_classify(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    langs = {d.lang for d in docs}
    assert len(out) == len(docs)
    assert {r.doc_id for r in out} == {d.doc_id for d in docs}
    for r in out:
        assert r.predicted_lang in langs
        assert r.nb_score < 0
        assert r.hit == int(r.predicted_lang == r.labeled_lang)

    # pure-Python recompute of the full model on the fixture corpus
    toks = {d.doc_id: [t for t in d.text.lower().strip().split() if t]
            for d in docs}
    counts: Counter = Counter()
    cls_docs: Counter = Counter()
    for d in docs:
        cls_docs[d.lang] += 1
        for t in toks[d.doc_id]:
            counts[(d.lang, t)] += 1
    vocab = {t for (_l, t) in counts}
    ct = Counter()
    for (l, _t), c in counts.items():
        ct[l] += c
    n = len(docs)

    def score(doc_id, lang):
        s = math.log(cls_docs[lang] / n)
        for t in toks[doc_id]:
            s += math.log((counts.get((lang, t), 0) + 1)
                          / (ct[lang] + len(vocab)))
        return round(s, 4)

    for r in out[:20]:
        # min over (-score, lang) = score desc, lang asc — the exact
        # tie-break the query's row_number ordering applies
        best = min(cls_docs, key=lambda l: (-score(r.doc_id, l), l))
        assert r.predicted_lang == best
        assert abs(r.nb_score - score(r.doc_id, best)) < 2e-4


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_text_nb_classify_matches_reference_on_random_corpora(
    spark, tmp_path, seed
):
    """Randomized-corpus pin: on a corpus with random token soup and
    random labels (no signal at all — the adversarial case for
    argmax/tie-break bugs), the Spark classifier must agree with the
    pure-Python reference model on EVERY document's prediction and
    rounded score."""
    import math
    from collections import Counter

    import numpy as np

    from adcirctime2cogs_spark.operators.textstats import text_nb_classify

    rng = np.random.default_rng(seed)
    langs = ["de", "en", "es", "fr"]
    rows = []
    for d in range(60):
        n_tok = int(rng.integers(1, 15))
        toks = [f"t{rng.integers(0, 30)}" for _ in range(n_tok)]
        rows.append((d, " ".join(toks), langs[rng.integers(0, 4)], "s", 1))
    sdf = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint"
    )
    corpus = str(tmp_path / "corpus")
    sdf.write.mode("overwrite").parquet(f"{corpus}/documents.parquet")
    out = {r.doc_id: r for r in text_nb_classify(spark, corpus).collect()}

    toks = {d: t.split() for d, t, _l, _s, _n in rows}
    label = {d: l for d, _t, l, _s, _n in rows}
    counts, cls_docs, ct = Counter(), Counter(), Counter()
    for d, _t, l, _s, _n in rows:
        cls_docs[l] += 1
        for t in toks[d]:
            counts[(l, t)] += 1
            ct[l] += 1
    vocab = len({t for (_l, t) in counts})

    def score(d, l):
        s = math.log(cls_docs[l] / len(rows))
        for t in toks[d]:
            s += math.log((counts.get((l, t), 0) + 1) / (ct[l] + vocab))
        return round(s, 4)

    assert set(out) == set(toks)
    for d in toks:
        best = min(cls_docs, key=lambda l: (-score(d, l), l))
        assert out[d].predicted_lang == best, (d, seed)
        assert abs(out[d].nb_score - score(d, best)) < 2e-4
        assert out[d].hit == int(best == label[d])


# ---------------------------------------------------- repetition stats
def test_repetition_stats_hand_example(spark):
    """Known-answer doc: 'a b a b c' -> 5 tokens / 3 distinct ->
    dup_token_frac 0.4; heaviest 2-gram 'a b' covers 2 x 3 = 6 of 9
    chars -> 0.6667; no duplicated 5-gram -> 0. A fully-repeated doc
    saturates the caps at 1."""
    from adcirctime2cogs_spark.operators.textstats import (
        repetition_filter, repetition_stats)

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x y " * 49 + "x y"), (3, "solo")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = rows[1]
    assert abs(r1.dup_token_frac - 0.4) < 1e-9
    assert abs(r1.top2_char_frac - round(6 / 9, 4)) < 1e-9
    assert r1.dup5_char_frac == 0.0
    # doc 2: 100 tokens of x/y; every 5-gram duplicated -> the dup
    # cap binds; the heaviest 2-gram 'x y' covers 50 x 3 of 199 chars
    r2 = rows[2]
    assert r2.dup_token_frac == round(1 - 2 / 100, 4)
    assert r2.dup5_char_frac == 1.0
    assert abs(r2.top2_char_frac - round(150 / 199, 4)) < 1e-9
    # doc 3: single token -> no n-grams at all, zeros not nulls
    r3 = rows[3]
    assert r3.dup_token_frac == 0.0
    assert r3.top2_char_frac == 0.0 and r3.dup10_char_frac == 0.0
    keep = {r.doc_id: r.keep for r in repetition_filter(docs).collect()}
    assert keep == {1: 0, 2: 0, 3: 1}


def test_repetition_stats_matches_duckdb_oracle(spark, sf_dir):
    """Pre-registration parity gate (the r10 window slot will run
    exactly this comparison through the driver): the Spark plan and
    _REPETITION_SQL must hash-match on the real documents fixture
    after r4 rounding."""
    import duckdb

    from adcirctime2cogs_spark.functions.numeric import expand_round_sql
    from adcirctime2cogs_spark.operators.textstats import (
        _REPETITION_SQL, repetition_stats)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = repetition_stats(docs).orderBy("doc_id").collect()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.sql(
        expand_round_sql(_REPETITION_SQL) + " ORDER BY doc_id"
    ).fetchall()
    assert len(got) == len(want) and len(got) > 0
    for g, w in zip(got, want):
        assert list(g) == pytest.approx(list(w), abs=1e-9), g.doc_id


def test_bigram_logprob_hand_example_and_duckdb_parity(spark, sf_dir):
    """bigram LM: on corpus {'a b', 'a b a b', 'solo'}, C(a,b)=3,
    C(b,a)=1, contexts C(a)=3, C(b)=1, V=3 (vocabulary includes the
    unscored single-token doc) -> lp(a,b) = ln(3.5/4.5), lp(b,a) =
    ln(1.5/2.5). Then full-fixture DuckDB parity of the ready r10
    oracle."""
    import math

    import duckdb

    from adcirctime2cogs_spark.functions.numeric import expand_round_sql
    from adcirctime2cogs_spark.operators.textstats import (
        _BIGRAM_SQL, bigram_logprob)

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b a b"), (3, "solo")], ["doc_id", "text"])
    rows = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    lp_ab = math.log(3.5 / 4.5)
    lp_ba = math.log(1.5 / 2.5)
    assert rows[1].n_bigrams == 1
    assert abs(rows[1].avg_logprob
               - math.floor(lp_ab * 1e4 + 0.5) / 1e4) < 1e-9
    want2 = (2 * lp_ab + lp_ba) / 3.0
    assert rows[2].n_bigrams == 3
    assert abs(rows[2].avg_logprob
               - math.floor(want2 * 1e4 + 0.5) / 1e4) < 1e-9
    assert 3 not in rows  # single token: no bigrams to score
    # fixture-scale parity with the stored oracle
    fix = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = bigram_logprob(fix).orderBy("doc_id").collect()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")
    want = con.sql(
        expand_round_sql(_BIGRAM_SQL) + " ORDER BY doc_id").fetchall()
    assert len(got) == len(want) and len(got) > 0
    for g, w in zip(got, want):
        assert list(g) == pytest.approx(list(w), abs=1e-9), g.doc_id


def test_token_budget_keepers_matches_duckdb_and_prefix_property(
        spark, sf_dir):
    """The r10/r11-queued token-budget mix: DuckDB parity of the
    skew-safe two-phase form against the naive-window oracle on the
    real fixture, plus the prefix property — per source the kept set
    is exactly the hash-order prefix whose exclusive running sum is
    under budget, every source contributes, and the first dropped doc
    would have crossed it."""
    import duckdb

    from adcirctime2cogs_spark.operators.dataprep import (
        TOKEN_BUDGET,
        _TOKEN_BUDGET_SQL,
        token_budget_keepers,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    got = token_budget_keepers(docs).orderBy("doc_id").collect()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")
    want = con.sql(_TOKEN_BUDGET_SQL + " ORDER BY doc_id").fetchall()
    assert len(got) == len(want) and len(got) > 0
    for g, w in zip(got, want):
        assert list(g) == list(w), g.doc_id
    # properties
    n_sources = docs.select("source").distinct().count()
    by_source = {}
    for r in got:
        by_source.setdefault(r.source, []).append(r)
    assert len(by_source) == n_sources  # every source contributes
    total_docs = docs.count()
    assert len(got) < total_docs  # the budget actually binds
    for src, rows in by_source.items():
        assert all(r.cum_before < TOKEN_BUDGET for r in rows)
        # the prefix crosses the budget on (or after) its last doc:
        # with one more doc the exclusive sum would be >= budget
        # unless the source ran out of docs entirely
        kept_tokens = sum(r.n_tokens for r in rows)
        src_docs = docs.filter(F.col("source") == src).count()
        assert kept_tokens >= TOKEN_BUDGET or len(rows) == src_docs
