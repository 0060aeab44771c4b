"""Dedup-family behavior tests: stop-shingle cap semantics, LSH recall
against the exact-Jaccard miner, and the pyspark.ml scale path."""

from pyspark.sql import functions as F

from adcirctime2cogs_spark.operators.dedup import (
    DF_CAP,
    _shingle_artifacts,
    dedup_minhash_lsh_pairs,
    dedup_minhash_ml,
    dedup_ngram_jaccard,
)


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [
            (i, text, "en", "test", len(text))
            for i, text in rows
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))


def test_stop_shingle_cap_blocks_boilerplate_pairs(spark, tmp_path):
    """A boilerplate sentence shared by > DF_CAP docs must not generate
    candidate pairs (the k^2 skew bomb), while true near-dup pairs that
    also share non-stop shingles are still found."""
    boiler = "this content is provided under the standard license terms"
    rows = []
    # DF_CAP + 8 docs share ONLY the boilerplate (unique filler after)
    for i in range(DF_CAP + 8):
        rows.append((i, f"{boiler} unique filler alpha{i} beta{i} gamma{i} delta{i}"))
    # one true near-dup pair sharing a long non-boilerplate body
    body = "the quick brown fox jumps over the lazy dog again and again today"
    rows.append((900, f"{body} ending one"))
    rows.append((901, f"{body} ending two"))
    _write_docs(spark, tmp_path, rows)

    sh, stop, inter = _shingle_artifacts(spark, str(tmp_path))
    stop_shingles = {r.sh for r in stop.collect()}
    assert stop_shingles, "boilerplate shingles did not cross the cap"
    assert all(s.split()[0] in boiler for s in stop_shingles)

    pairs = inter.select("doc_a", "doc_b").collect()
    pair_set = {(r.doc_a, r.doc_b) for r in pairs}
    assert (900, 901) in pair_set
    # no boilerplate-only pair survives: k^2 explosion capped
    assert all(a >= 900 for a, _ in pair_set), sorted(pair_set)[:5]

    jac = dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    assert {(r.doc_a, r.doc_b) for r in jac} == {(900, 901)}


def test_lsh_pairs_recall_vs_exact(spark, sf_dir):
    """Every exact-Jaccard >= 0.8 pair must be recovered by the
    MinHash-LSH pipeline (its verify threshold is 0.5, so >= 0.8 pairs
    survive whenever banding surfaces them — the planted dups do)."""
    exact = {
        (r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh_pairs(spark, sf_dir).collect()
    }
    assert exact, "fixture has no planted near-dup documents"
    missed = exact - lsh
    assert not missed, f"LSH missed exact pairs: {sorted(missed)[:5]}"


def test_minhash_ml_finds_planted_pairs(spark, sf_dir):
    """The pyspark.ml MinHashLSH scale path finds the same planted
    near-dup pairs as the exact-Jaccard miner (values engine-specific,
    membership is not)."""
    exact = {
        (r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    ml = {
        (r.doc_a, r.doc_b) for r in dedup_minhash_ml(spark, sf_dir).collect()
    }
    assert exact, "fixture has no planted near-dup documents"
    missed = exact - ml
    assert not missed, f"ml LSH missed exact pairs: {sorted(missed)[:5]}"


def test_pagerank_deep_iteration_with_checkpoint(spark, sf_dir):
    """12 checkpointed rounds must run without lineage blowup and
    conserve (damped) rank mass: sum(pr_scaled) == N minus the
    dangling-node leak, i.e. strictly between 0.15*N and N."""
    from adcirctime2cogs_spark.operators.graphops import (
        _event_edges,
        pagerank_iterations,
    )
    from pyspark.sql import functions as F

    out = pagerank_iterations(
        _event_edges(spark, sf_dir), iterations=12, checkpoint_every=5
    )
    agg = out.agg(F.sum("pr_scaled").alias("s"), F.count("*").alias("n")).first()
    assert 0.15 * agg.n < agg.s <= agg.n + 1e-6
    assert out.filter(F.col("pr_scaled") <= 0).count() == 0


def test_hll_sketch_rollup_merge_equals_direct(spark, sf_dir):
    """The mergeability contract behind events_sketch_rollup: unioning
    hourly sketches must give the SAME estimate as sketching each day
    directly (same final sketch state), and estimates must be within
    HLL error of exact distinct counts."""
    from pyspark.sql import functions as F

    from adcirctime2cogs_spark.operators.eventwindows import (
        events_sketch_rollup,
    )
    from adcirctime2cogs_spark.tables import load_table

    rolled = {
        r.day: r.approx_users
        for r in events_sketch_rollup(spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events")
    direct = {
        r.day: r.est
        for r in events.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert rolled == direct  # merge-then-estimate == estimate-direct
    exact = {
        r.day: r.n
        for r in events.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for day, est in rolled.items():
        assert abs(est - exact[day]) <= max(3, 0.05 * exact[day])


def test_lsh_bucket_cap_star_path(spark):
    """Over-cap LSH buckets must switch from all-pairs to TWO-rep star
    pairs: a 100-doc bucket (> LSH_BUCKET_CAP=64) emits the min-rep
    star (0, i) plus the max-rep star (i, 99) — 2n-3 = 197 pairs, never
    the 4950 all-pairs — so one false-positive representative cannot
    sever the cluster; a 3-doc bucket still enumerates all 3 pairs."""
    from adcirctime2cogs_spark.operators.dedup import (
        LSH_BUCKET_CAP,
        _lsh_candidates,
    )

    assert LSH_BUCKET_CAP < 100
    rows = [(i, 0, "big") for i in range(100)] + [
        (200, 1, "small"), (201, 1, "small"), (202, 1, "small"),
    ]
    bands = spark.createDataFrame(rows, "doc_id long, band int, bkey string")
    cand = _lsh_candidates(bands)
    got = {(r.doc_a, r.doc_b) for r in cand.collect()}
    star = {(0, i) for i in range(1, 100)} | {
        (i, 99) for i in range(99)
    }
    small_pairs = {(200, 201), (200, 202), (201, 202)}
    assert got == star | small_pairs
    assert len(star) == 2 * 100 - 3
    # the star fallback must announce itself IN-BAND on the very
    # action that took it (ADVICE r10): the candidate plan carries a
    # starcap observation, no separate lsh_bucket_stats call needed
    from adcirctime2cogs_spark.operators.starcap import (
        observed_star_metrics,
    )

    m = observed_star_metrics(cand)["lsh_bucket"]
    assert m["groups_over_cap"] == 1
    assert m["max_group_size"] == 100
    assert m["cap"] == LSH_BUCKET_CAP


def test_lsh_bucket_stats_no_over_cap_at_test_sf(spark, sf_dir):
    """The exact-pairs oracle for dedup_minhash_lsh_pairs only holds
    while no bucket exceeds the cap — pin that this is true at the
    test SFs, and that the stats surface is wired."""
    from adcirctime2cogs_spark.operators.dedup import lsh_bucket_stats

    stats = lsh_bucket_stats(spark, sf_dir)
    assert stats["n_over_cap"] == 0
    assert stats["pairs_dropped_to_star"] == 0
    assert stats["n_buckets"] > 0
    assert 2 <= stats["max_bucket"] <= stats["bucket_cap"]


def test_lsh_bucket_stats_no_over_cap_at_driver_sf(spark, sf_medium_dir):
    """Same pin at sf0.01 — the scale the EXTERNAL driver window
    hash-checks the oracle at. If a fixture regeneration ever produced
    an over-cap bucket here, the driver would report a false red (its
    window has no lsh_bucket_stats guard), so this assert is the early
    tripwire."""
    from adcirctime2cogs_spark.operators.dedup import lsh_bucket_stats

    stats = lsh_bucket_stats(spark, sf_medium_dir)
    assert stats["n_over_cap"] == 0
    assert stats["pairs_dropped_to_star"] == 0


def test_sem_cell_cap_star_path_bounds_mass_duplication(spark):
    """VERDICT r09 #3: a pathological IVF cell (20k near-identical
    embeddings — adversarial mass duplication) must take the two-rep
    star path, emitting 2n-3 candidate rows instead of ~2*10^8
    all-pairs, while a small cell still enumerates exactly; and the
    keeper rule on the star relation keeps ONLY the cell's earliest
    member (every later member is a near-dup of rep 1)."""
    from adcirctime2cogs_spark.operators.dedup import (
        SEM_CELL_CAP,
        _sem_cell_candidates,
        _semdedup_keepers_from,
    )

    big_n = 20_000
    assert SEM_CELL_CAP < big_n
    rows = [
        (i, [1.0, 0.0], 7, 0.5 + i * 1e-8) for i in range(big_n)
    ] + [
        (100_000, [0.0, 1.0], 9, 0.1),
        (100_001, [0.0, 1.0], 9, 0.2),
        (100_002, [1.0, -1.0], 9, 0.3),
    ]
    scored = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cell long, cs double"
    )
    cand = _sem_cell_candidates(scored)
    per_cell_df = cand.groupBy("cell").agg(F.count("*").alias("cnt"))
    per_cell = {r.cell: r.cnt for r in per_cell_df.collect()}
    assert per_cell[7] == 2 * big_n - 3  # star, never the quadratic
    assert per_cell[9] == 3              # small cell: exact all-pairs
    # in-band over-cap signal rides the same action (ADVICE r10)
    from adcirctime2cogs_spark.operators.starcap import (
        observed_star_metrics,
    )

    m = observed_star_metrics(per_cell_df)["sem_cell"]
    assert m["groups_over_cap"] == 1
    assert m["max_group_size"] == big_n
    assert m["cap"] == SEM_CELL_CAP
    keepers = {r.vec_id for r in _semdedup_keepers_from(scored).collect()}
    # big cell: only the earliest member survives; small cell: the
    # two identical vectors dedupe to the earlier one, the
    # anti-correlated third survives
    assert keepers == {0, 100_000, 100_002}


def test_sem_cell_stats_no_over_cap_at_test_sfs(spark, sf_dir,
                                                sf_medium_dir):
    """The all-pairs oracles for dedup_semantic_pairs/keepers only
    hold while no IVF cell exceeds SEM_CELL_CAP — pin that this is
    true at both the pytest SF and the external driver's sf0.01, so
    the cap is provably inert on every externally hashed plan
    (registry rule-1 note, round 10)."""
    from adcirctime2cogs_spark.operators.dedup import sem_cell_stats

    for d in (sf_dir, sf_medium_dir):
        stats = sem_cell_stats(spark, d)
        assert stats["n_over_cap"] == 0
        assert stats["pairs_dropped_to_star"] == 0
        assert 0 < stats["max_cell"] <= stats["cell_cap"]


def test_prefix_jaccard_equals_exact_path(spark, sf_dir):
    """Prefix filtering is LOSSLESS: dedup_prefix_jaccard must return
    byte-identical rows to the full posting-list dedup_ngram_jaccard
    (same stop-filtered universe, same threshold, same rounding)."""
    from adcirctime2cogs_spark.operators.dedup import dedup_prefix_jaccard

    exact = dedup_ngram_jaccard(spark, sf_dir)
    pref = dedup_prefix_jaccard(spark, sf_dir)
    assert exact.count() > 0, "fixture has no planted near-dup documents"
    assert exact.exceptAll(pref).count() == 0
    assert pref.exceptAll(exact).count() == 0


def test_prefix_theorem_candidate_completeness():
    """Pure-python randomized check of the guarantee the Spark plan
    relies on: under ANY shared total order, every pair of sets with
    Jaccard >= 0.8 shares an element inside BOTH prefixes of length
    n - ceil(0.8*n) + 1 (Bayardo et al. WWW'07 / Xiao et al. WWW'08).
    The Spark plan's order is (doc frequency, shingle); here it is the
    natural int order — the theorem is order-agnostic."""
    import random

    rng = random.Random(7)
    checked = 0
    for _ in range(2000):
        a = set(rng.sample(range(60), rng.randint(5, 40)))
        b = set(a)
        for _ in range(rng.randint(0, 6)):  # mutate a into b
            if rng.random() < 0.5 and len(b) > 3:
                b.discard(rng.choice(sorted(b)))
            else:
                b.add(rng.randrange(60))
        c = len(a & b)
        if c / len(a | b) < 0.8:
            continue
        checked += 1

        def prefix(s):
            n = len(s)
            return set(sorted(s)[: n - (4 * n + 4) // 5 + 1])

        assert prefix(a) & prefix(b), (sorted(a), sorted(b))
    assert checked > 100, f"only {checked} high-jaccard pairs generated"


def test_prefix_candidates_superset_of_exact_pairs(spark, sf_dir):
    """The prefix inverted index may only ADD candidates, never lose a
    true pair: every exact >= 0.8 pair must appear in the candidate
    table (the Spark-plan half of the prefix theorem; the pure-python
    half is test_prefix_theorem_candidate_completeness)."""
    from adcirctime2cogs_spark.operators.dedup import _prefix_candidates

    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    cand = {
        (r.doc_a, r.doc_b) for r in _prefix_candidates(spark, sf_dir).collect()
    }
    assert exact, "fixture has no planted near-dup documents"
    missed = exact - cand
    assert not missed, f"prefix filter lost true pairs: {sorted(missed)[:5]}"


def test_substring_spans_semantics(spark, tmp_path):
    """Hand-built corpus with a KNOWN shared 14-token run: the two
    carrier docs must each report exactly one merged span covering the
    run's window starts ([start, start+14) as token positions, 3
    windows at K=12), and a doc whose only repeat is INTERNAL (same
    window twice in one doc, nowhere else) must report nothing —
    duplication is across documents."""
    import os

    from adcirctime2cogs_spark.operators.dedup import (
        SPAN_K,
        dedup_substring_spans,
    )

    run = " ".join(f"dup{j}" for j in range(SPAN_K + 2))  # 14 tokens
    uniq = lambda tag, n: " ".join(f"{tag}{j}" for j in range(n))
    docs = spark.createDataFrame(
        [
            # run at token positions 5..18
            (0, uniq("a", 5) + " " + run + " " + uniq("b", 6)),
            # run at token positions 0..13
            (1, run + " " + uniq("c", 8)),
            # internal repeat only: run appears twice in THIS doc but
            # the windows also occur in docs 0/1 -> covered; so use a
            # different internal-only phrase
            (2, uniq("x", 3) + " "
                + " ".join(f"self{j}" for j in range(SPAN_K))
                + " " + uniq("y", 3) + " "
                + " ".join(f"self{j}" for j in range(SPAN_K))),
            (3, uniq("z", 30)),
        ],
        "doc_id bigint, text string",
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("t").alias("source"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    out = str(tmp_path)
    docs.write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    rows = {
        r.doc_id: (r.span_start, r.span_end, r.n_windows)
        for r in dedup_substring_spans(spark, out).collect()
    }
    # doc 0: window starts 5, 6, 7 -> merged span [5, 7 + K) = [5, 19)
    assert rows[0] == (5, 7 + SPAN_K, 3)
    # doc 1: window starts 0, 1, 2 -> [0, 14)
    assert rows[1] == (0, 2 + SPAN_K, 3)
    # doc 2's repeat is within one document; doc 3 is unique
    assert 2 not in rows and 3 not in rows


def test_substring_scrub_cuts_exactly_the_spans(spark, tmp_path):
    """The scrub consumer on the same hand-built corpus: carrier docs
    lose exactly their duplicated run (tokens re-joined on single
    spaces), internal-repeat and unique docs emit nothing, and a doc
    whose EVERY token is covered emits an empty string."""
    import os

    from adcirctime2cogs_spark.operators.dedup import (
        SPAN_K,
        text_substring_scrub,
    )

    run = " ".join(f"dup{j}" for j in range(SPAN_K + 2))
    uniq = lambda tag, n: " ".join(f"{tag}{j}" for j in range(n))
    docs = spark.createDataFrame(
        [
            (0, uniq("a", 5) + " " + run + " " + uniq("b", 6)),
            (1, run + " " + uniq("c", 8)),
            (2, run),  # the whole doc IS the duplicated run
            (3, uniq("z", 30)),
        ],
        "doc_id bigint, text string",
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("t").alias("source"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    out = str(tmp_path)
    docs.write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    rows = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in text_substring_scrub(spark, out).collect()
    }
    assert rows[0] == (uniq("a", 5) + " " + uniq("b", 6), SPAN_K + 2)
    assert rows[1] == (uniq("c", 8), SPAN_K + 2)
    assert rows[2] == ("", SPAN_K + 2)  # fully covered -> empty text
    assert 3 not in rows  # unique doc: nothing to scrub


def test_substring_spans_randomized_equivalence(spark, tmp_path):
    """Randomized oracle: seeded corpora with planted shared runs of
    varying lengths/positions (including overlapping and adjacent
    plants) must produce exactly the spans a brute-force pure-Python
    reference computes — the merge rule, cross-document-only
    duplication, and window math all covered parametrically."""
    import os
    import random
    from collections import defaultdict

    from adcirctime2cogs_spark.operators.dedup import (
        SPAN_K,
        dedup_substring_spans,
    )

    def brute(texts):
        toks = {d: t.split() for d, t in texts.items()}
        wins = defaultdict(set)
        for d, t in toks.items():
            for p in range(len(t) - SPAN_K + 1):
                wins[" ".join(t[p:p + SPAN_K])].add(d)
        spans = []
        for d, t in sorted(toks.items()):
            cur = None
            for p in range(len(t) - SPAN_K + 1):
                if len(wins[" ".join(t[p:p + SPAN_K])]) < 2:
                    continue
                if cur and p <= cur[2]:
                    cur = (d, cur[1], p + SPAN_K, cur[3] + 1)
                else:
                    if cur:
                        spans.append(cur)
                    cur = (d, p, p + SPAN_K, 1)
            if cur:
                spans.append(cur)
                cur = None
        return sorted(spans)

    for seed in (7, 11, 23):
        rng = random.Random(seed)
        n_docs = 30
        texts = {}
        for d in range(n_docs):
            n = rng.randint(SPAN_K - 2, 60)  # some docs too short
            texts[d] = " ".join(
                f"w{d}x{j}" for j in range(n)  # unique per doc
            )
        # plant shared runs across random doc pairs
        for r in range(8):
            ln = rng.randint(SPAN_K, SPAN_K + 10)
            run = " ".join(f"r{seed}p{r}t{j}" for j in range(ln))
            for d in rng.sample(range(n_docs), rng.randint(2, 4)):
                t = texts[d].split()
                pos = rng.randint(0, len(t))
                texts[d] = " ".join(t[:pos] + run.split() + t[pos:])
        out = str(tmp_path / f"s{seed}")
        spark.createDataFrame(
            [(d, t) for d, t in texts.items()],
            "doc_id bigint, text string",
        ).select(
            "doc_id", "text", F.lit("en").alias("lang"),
            F.lit("t").alias("source"),
            F.length("text").cast("bigint").alias("n_chars"),
        ).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
        got = sorted(
            (r.doc_id, r.span_start, r.span_end, r.n_windows)
            for r in dedup_substring_spans(spark, out).collect()
        )
        want = brute(texts)
        assert got == want, f"seed {seed}: {got[:3]} vs {want[:3]}"
        assert want, f"seed {seed} planted nothing"


def test_semdedup_planted_twins_within_cell_bound_and_keeper_rule(
    spark, tmp_path
):
    """SemDeDup corpus leg (round-9): 1500 synthetic vectors with 40
    planted semantic twins. Proves (1) recall — every planted twin
    pair is found; (2) the candidate space is WITHIN-CELL, not
    all-pairs (the enumerated candidate count is a small fraction of
    n*(n-1)/2); (3) the keeper rule matches a local numpy
    reimplementation of the paper's ordering exactly (farthest-from-
    centroid survivor, EXISTS-earlier drop test)."""
    import numpy as np

    from adcirctime2cogs_spark.operators.dedup import (
        SEM_TAU,
        dedup_semantic_keepers,
        dedup_semantic_pairs,
    )
    from adcirctime2cogs_spark.operators.similarity import CENT_MOD
    from adcirctime2cogs_spark.tables import drop_layouts

    rng = np.random.default_rng(42)
    n, dim, n_twins = 1500, 64, 40
    vecs = rng.normal(size=(n, dim)).astype("float32")
    planted = []
    for k in range(n_twins):
        a, b = 3 * k, 3 * k + 1  # distinct, interleaved with centroids
        vecs[b] = vecs[a] + 0.01 * rng.normal(size=dim).astype("float32")
        planted.append((a, b))
    corpus = str(tmp_path / "corpus")
    import os

    os.makedirs(corpus)
    spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).write.parquet(os.path.join(corpus, "embeddings.parquet"))

    try:
        pairs = {
            (r.vec_a, r.vec_b)
            for r in dedup_semantic_pairs(spark, corpus).collect()
        }
        for a, b in planted:
            assert (a, b) in pairs, f"planted twin ({a},{b}) missed"

        # numpy ground truth of assignment + keeper rule
        v64 = vecs.astype("float64")
        norms = np.sqrt((v64 * v64).sum(axis=1))
        cent_ids = np.array([i for i in range(n) if i % CENT_MOD == 1])
        cs_all = (v64 @ v64[cent_ids].T) / np.outer(norms, norms[cent_ids])

        def half_up4(x):
            return np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4

        cs_r = half_up4(cs_all)
        # top-1 by (cs desc, cent_id asc): argmax on rounded scores,
        # ties to the LOWEST centroid id (argmax picks first maximum)
        best = cs_r.argmax(axis=1)
        cell = cent_ids[best]
        cent_sim = cs_r[np.arange(n), best]

        # candidate bound: within-cell pairs << all pairs
        _, counts = np.unique(cell, return_counts=True)
        within = int((counts * (counts - 1) // 2).sum())
        assert within < 0.05 * n * (n - 1) / 2

        # keeper rule: drop i iff an EARLIER member of its cell (by
        # cent_sim asc, id asc) has cosine >= SEM_TAU with it
        dropped = set()
        for c in np.unique(cell):
            members = np.where(cell == c)[0]
            order = members[np.lexsort((members, cent_sim[members]))]
            for i, mi in enumerate(order):
                for mj in order[:i]:
                    cos = half_up4(
                        v64[mi] @ v64[mj] / (norms[mi] * norms[mj])
                    )
                    if cos >= SEM_TAU:
                        dropped.add(int(mi))
                        break
        keepers = {
            r.vec_id for r in dedup_semantic_keepers(spark, corpus).collect()
        }
        assert keepers == set(range(n)) - dropped
        # a planted pair never survives intact (its closer-to-centroid
        # member is dropped; BOTH may drop when a chain to an earlier
        # accidental near-dup exists — the paper's rule permits that)
        for a, b in planted:
            assert not (a in keepers and b in keepers)
    finally:
        drop_layouts(spark, corpus)


def test_semdedup_scale_path_matches_oracle_path(spark, sf_dir,
                                                 sf_medium_dir):
    """The BLAS assignment path (mapInPandas matmul against the
    broadcast centroid matrix) must reproduce the registered
    materialized-table path EXACTLY on the fixtures — same cells,
    same rounded centroid similarities, same keeper set. Divergence
    is only possible where two r4-rounded cosines collide at the
    1e-4 boundary; equality here pins that the fixture data has no
    such collision and that the tie-break (lowest centroid id)
    matches the row_number ordering."""
    from adcirctime2cogs_spark.operators.dedup import (
        _semdedup_scored,
        _semdedup_scored_fast,
        dedup_semantic_keepers,
        dedup_semantic_keepers_scale,
    )

    for sf in (sf_dir, sf_medium_dir):
        slow = {
            (r.vec_id, r.cell, r.cs)
            for r in _semdedup_scored(spark, sf)
            .select("vec_id", "cell", "cs").collect()
        }
        fast = {
            (r.vec_id, r.cell, r.cs)
            for r in _semdedup_scored_fast(spark, sf)
            .select("vec_id", "cell", "cs").collect()
        }
        assert slow == fast, (
            f"{sf}: assignment differs on "
            f"{len(slow ^ fast)} (vec, cell, cs) triples"
        )
        k_slow = {tuple(r) for r in dedup_semantic_keepers(spark, sf)
                  .collect()}
        k_fast = {tuple(r) for r in
                  dedup_semantic_keepers_scale(spark, sf).collect()}
        assert k_slow == k_fast


def test_d4_prototype_prune_matches_duckdb_and_properties(spark, sf_dir):
    """The r10-queued D4 pruning (drop the most-central ceil(q*cn) of
    each IVF cell): DuckDB parity with the ready oracle on the real
    embeddings fixture, plus the structural properties — per cell
    exactly ceil(q*cn) members are gone, the survivors are the LOWER
    cent_sim tail under the (cs DESC, vec_id) order, and survivor
    ranks start past the dropped prefix."""
    import math

    import duckdb
    import pytest

    from adcirctime2cogs_spark.functions.numeric import expand_round_sql
    from adcirctime2cogs_spark.operators.dedup import (
        D4_PRUNE_Q,
        _d4_prune_sql,
        d4_prototype_prune,
    )
    from adcirctime2cogs_spark.operators.similarity import _ivf_cells_table

    got = d4_prototype_prune(spark, sf_dir).orderBy("vec_id").collect()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS "
            f"SELECT * FROM '{sf_dir}/embeddings.parquet'")
    want = con.sql(
        expand_round_sql(_d4_prune_sql()) + " ORDER BY vec_id"
    ).fetchall()
    assert len(got) == len(want) and len(got) > 0
    for g, w in zip(got, want):
        assert list(g) == pytest.approx(list(w), abs=1e-9), g.vec_id
    # structural: each cell lost exactly ceil(q * cn), and every
    # survivor's rank exceeds that prefix
    cells = {}
    for r in _ivf_cells_table(spark, sf_dir).collect():
        cells[r.cell] = cells.get(r.cell, 0) + 1
    surv_by_cell = {}
    for r in got:
        surv_by_cell.setdefault(r.cell, []).append(r)
    for cell, cn in cells.items():
        cut = math.ceil(D4_PRUNE_Q * cn)
        surv = surv_by_cell.get(cell, [])
        assert len(surv) == cn - cut, cell
        assert all(r.proto_rank > cut for r in surv), cell


def test_incremental_pairs_match_from_scratch_rerun(spark, tmp_path):
    """The growing-corpus path: near-dups of a NEW batch against a
    persisted base layout must equal the from-scratch LSH rerun over
    the concatenated corpus restricted to pairs touching the batch —
    and must keep working after the base documents table is moved to
    'cold storage' (the layout, not the raw text, is the serving
    artifact)."""
    import os
    import shutil

    from adcirctime2cogs_spark.operators.dedup import (
        dedup_incremental_pairs,
        dedup_minhash_lsh_pairs,
        incremental_stop_drift,
    )

    base_dir = str(tmp_path / "base")
    new_dir = str(tmp_path / "new")
    union_dir = str(tmp_path / "union")
    os.makedirs(base_dir)
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base.write.parquet(os.path.join(base_dir, "documents.parquet"))

    # new batch: 3 one-token-mutated twins of base docs + 2 fresh docs
    twins = (
        base.orderBy("doc_id").limit(3)
        .select(
            (F.col("doc_id") + 9_000_000).alias("doc_id"),
            F.concat(
                F.lit("zqx "),
                F.expr("substring(text, instr(text, ' ') + 1)"),
            ).alias("text"),
            "lang", "source", "n_chars",
        )
    )
    fresh = spark.createDataFrame(
        [(9_500_000 + i,
          " ".join(f"uniq{i}tok{j}" for j in range(40)),
          "en", "src0", 400) for i in range(2)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    newdocs = twins.unionByName(fresh)
    os.makedirs(new_dir)
    newdocs.write.parquet(os.path.join(new_dir, "documents.parquet"))
    os.makedirs(union_dir)
    base.unionByName(newdocs).write.parquet(
        os.path.join(union_dir, "documents.parquet")
    )

    assert incremental_stop_drift(spark, base_dir, new_dir) == 0

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_incremental_pairs(spark, base_dir, new_dir)
        .collect()
    }
    new_ids = {r.doc_id for r in newdocs.select("doc_id").collect()}
    want = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_minhash_lsh_pairs(spark, union_dir).collect()
        if r.doc_a in new_ids or r.doc_b in new_ids
    }
    assert got == want
    # every planted twin was found against its base original
    twin_pairs = {p for p in got if p[1] >= 9_000_000 and
                  p[0] == p[1] - 9_000_000}
    assert len(twin_pairs) == 3
    # fresh docs are near-dups of nothing
    assert not any(p[0] >= 9_500_000 or p[1] >= 9_500_000 for p in got)

    # cold storage: the raw base text gone, the persisted layout
    # keeps serving increments
    shutil.move(os.path.join(base_dir, "documents.parquet"),
                str(tmp_path / "cold"))
    again = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_incremental_pairs(spark, base_dir, new_dir)
        .collect()
    }
    assert again == got


def test_incremental_exact_gate(spark, tmp_path):
    """dedup_incremental_exact: a new batch with one byte-identical
    copy of a base doc, one within-batch duplicate pair, and one
    fresh doc flags exactly the copies with keep-lowest dup_of — via
    the persisted hash subtable, not a base re-read."""
    import os

    from adcirctime2cogs_spark.operators.dedup import (
        dedup_incremental_exact,
    )

    base_dir = str(tmp_path / "base")
    new_dir = str(tmp_path / "new")
    os.makedirs(base_dir)
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base.write.parquet(os.path.join(base_dir, "documents.parquet"))
    victim = base.orderBy("doc_id").limit(1).collect()[0]
    newdocs = spark.createDataFrame(
        [
            (9_000_001, victim.text, "en", "src0", victim.n_chars),
            (9_000_002, "twice told tale " * 5, "en", "src0", 80),
            (9_000_003, "twice told tale " * 5, "en", "src0", 80),
            (9_000_004, "a genuinely new document body", "en", "src0", 29),
            # NORMALIZED duplicate of the base victim (case +
            # whitespace variants): dedup_exact groups these, so the
            # incremental gate must too (review r11 — the raw-text
            # xxhash64 gate missed it)
            (9_000_005, "  " + victim.text.upper().replace(" ", "  "),
             "en", "src0", victim.n_chars),
        ],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    os.makedirs(new_dir)
    newdocs.write.parquet(os.path.join(new_dir, "documents.parquet"))
    got = {
        r.doc_id: r.dup_of
        for r in dedup_incremental_exact(spark, base_dir, new_dir)
        .collect()
    }
    assert got == {
        9_000_001: victim.doc_id,
        9_000_003: 9_000_002,
        9_000_005: victim.doc_id,
    }
