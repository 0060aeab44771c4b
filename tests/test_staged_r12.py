"""Operators built in round 11's second half. Registered into r11
rule-2 window slots (the 5-round staleness policy made room — see
tests/test_registry.py::POLICY_ROUNDS): paragraph first-keeper dedup,
CCNet perplexity buckets, per-user EWMA smoothing. Queued for r13
rule-2 slots with ready oracles: the CUSUM change-point detector, the
two-sample KS drift test, and the split-leakage audit (sections
below). Beyond the registry sweep, each gets a semantics pin on a
constructed fixture and a plan-shape gate."""

from pyspark.sql import functions as F

from adcirctime2cogs_spark.operators.dedup import (
    PARA_K,
    _PARAGRAPH_FIRST_SQL,
    dedup_paragraph_first,
)
from adcirctime2cogs_spark.operators.eventwindows import (
    _EWMA_SQL,
    events_ewma_smooth,
)
from adcirctime2cogs_spark.operators.textstats import (
    _PPL_BUCKETS_SQL,
    text_ppl_buckets,
)
from tests.oracle_util import compare


def _no_cartesian(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan


def test_paragraph_first_parity_and_plan(spark, sf_dir):
    n = compare(spark, sf_dir, dedup_paragraph_first, _PARAGRAPH_FIRST_SQL)
    assert n == 500
    _no_cartesian(dedup_paragraph_first(spark, sf_dir))


def test_paragraph_first_nonvacuous(spark, sf_dir):
    agg = dedup_paragraph_first(spark, sf_dir).agg(
        F.sum("n_tiles").alias("t"), F.sum("n_kept").alias("k")
    ).first()
    # the fixture plants exact/near duplicates, so tiles must be lost
    assert agg["k"] < agg["t"]


def test_paragraph_first_keeper_semantics(spark, tmp_path):
    """First-keeper, not remove-everywhere: a tile repeated across
    docs survives exactly once, at its global (doc_id, p) minimum —
    including the within-doc repeat case."""
    tile_a = " ".join(f"a{i}" for i in range(PARA_K))
    tile_b = " ".join(f"b{i}" for i in range(PARA_K))
    tile_c = " ".join(f"c{i}" for i in range(PARA_K))
    rows = [
        # doc 0: A B  -> keeps both (first occurrence of each)
        (0, f"{tile_a} {tile_b}"),
        # doc 1: B A  -> loses both to doc 0
        (1, f"{tile_b} {tile_a}"),
        # doc 2: C C  -> keeps the FIRST copy only (within-doc repeat)
        (2, f"{tile_c} {tile_c}"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in dedup_paragraph_first(spark, str(tmp_path)).collect()
    }
    assert got[0]["n_kept"] == 2 and got[0]["kept_text"] == rows[0][1]
    assert got[1]["n_kept"] == 0 and got[1]["kept_text"] == ""
    assert got[2]["n_kept"] == 1 and got[2]["kept_text"] == tile_c
    # corpus-wide: every distinct tile survives exactly once
    assert sum(r["n_kept"] for r in got.values()) == 3


def test_paragraph_first_key_range_enforced(spark, tmp_path):
    """The doc_id * 2^20 + p keeper key is exact only while doc_id <
    2^43 (ADVICE r11: the range was documented but not policed — an
    out-of-range corpus silently collided into the neighbor's key
    space). A planted doc_id at the boundary must fail the job loudly
    instead of producing wrong first-keeper choices."""
    import pytest as _pt

    from adcirctime2cogs_spark.operators.dedup import _PARA_DOC_MAX

    tile = " ".join(f"w{i}" for i in range(PARA_K))
    spark.createDataFrame(
        [(_PARA_DOC_MAX, tile, "en", "test", len(tile))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    with _pt.raises(Exception, match="out of encodable range"):
        dedup_paragraph_first(spark, str(tmp_path)).collect()


def test_ppl_buckets_parity_and_plan(spark, sf_dir):
    n = compare(spark, sf_dir, text_ppl_buckets, _PPL_BUCKETS_SQL)
    assert n == 15  # 5 langs x head/middle/tail
    _no_cartesian(text_ppl_buckets(spark, sf_dir))


def test_ppl_buckets_ordering_invariant(spark, sf_dir):
    """Within a language the head bucket's mean perplexity can't
    exceed the tail's (ntile assigns by ascending ppl)."""
    rows = text_ppl_buckets(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, b in by_lang.items():
        assert set(b) == {"head", "middle", "tail"}, lang
        assert b["head"]["avg_ppl"] <= b["middle"]["avg_ppl"] <= (
            b["tail"]["avg_ppl"]
        ), lang
        # ntile balance: bucket sizes differ by at most 1
        sizes = [b[k]["n_docs"] for k in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, lang


def test_ewma_parity_and_plan(spark, sf_dir):
    n = compare(spark, sf_dir, events_ewma_smooth, _EWMA_SQL)
    assert n == 1000
    _no_cartesian(events_ewma_smooth(spark, sf_dir))


def test_ewma_first_event_and_bounds(spark, sf_dir):
    """Each user's first event smooths to its own value; every EWMA
    lies within the [min, max] of that user's trailing window (a
    convex combination can't escape its inputs)."""
    from pyspark.sql import Window as W

    df = events_ewma_smooth(spark, sf_dir)
    w_cols = df.select(
        "user_id", "ts", "event_id", "value", "ewma"
    )
    first = (
        w_cols.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
        .filter("rn = 1")
        .filter(F.abs(F.col("ewma") - F.col("value")) > 1e-4)
        .count()
    )
    assert first == 0

    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-7, 0)
    violations = (
        w_cols.withColumn("lo", F.min("value").over(w))
        .withColumn("hi", F.max("value").over(w))
        .filter(
            (F.col("ewma") < F.col("lo") - 1e-4)
            | (F.col("ewma") > F.col("hi") + 1e-4)
        )
        .count()
    )
    assert violations == 0


# --- r13 queue: CUSUM change-point detector --------------------------------


def test_cusum_parity_and_plan(spark, sf_dir):
    from adcirctime2cogs_spark.operators.eventwindows import (
        _CUSUM_SQL,
        events_cusum_changepoint,
    )

    n = compare(spark, sf_dir, events_cusum_changepoint, _CUSUM_SQL)
    assert n > 0  # non-vacuous at sf0.001 (21 rows at the 4-sigma point)
    _no_cartesian(events_cusum_changepoint(spark, sf_dir))


def test_cusum_fires_after_planted_shift_only(spark, tmp_path):
    """Semantics on a planted step change: a level shift of +3 sigma
    halfway through a quiet series must trip the detector AFTER the
    shift and never before it. Values are noiseless around each level,
    so expectations are exact: pre-shift cusum stays at 0 (x - mu - k
    < 0 throughout), post-shift it climbs by a fixed step per event
    and crosses 4*sd at a computable index."""
    import datetime

    from adcirctime2cogs_spark.operators.eventwindows import (
        events_cusum_changepoint,
    )

    base = datetime.datetime(2024, 1, 1)
    n, shift_at = 400, 200
    rows = [
        (
            i,
            base + datetime.timedelta(seconds=i),
            1,
            "probe",
            10.0 if i < shift_at else 20.0,
            "{}",
        )
        for i in range(n)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = sorted(
        r["event_id"]
        for r in events_cusum_changepoint(spark, str(tmp_path)).collect()
    )
    assert got, "planted +2 sigma step never tripped the detector"
    assert got[0] >= shift_at  # nothing flagged before the shift
    # once tripped, the climb is monotone: every later event flags too
    assert got == list(range(got[0], n))


# --- r13 queue: two-sample KS drift test ------------------------------------


def test_ks_parity_and_plan(spark, sf_dir):
    from adcirctime2cogs_spark.operators.eventwindows import (
        _KS_SQL,
        events_ks_drift,
    )

    n = compare(spark, sf_dir, events_ks_drift, _KS_SQL)
    assert n == 10  # C(5 types, 2) pairs
    _no_cartesian(events_ks_drift(spark, sf_dir))


def test_ks_extremes_on_planted_distributions(spark, tmp_path):
    """D is exactly 1 for disjoint supports, exactly 0 for identical
    multisets, and in between for a half-shifted pair — all integer
    arithmetic, so the expectations are equalities, not tolerances."""
    import datetime

    from adcirctime2cogs_spark.operators.eventwindows import events_ks_drift

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 'low' in [0,100), 'high' in [1000,1100): disjoint -> D = 1
    # 'same' == 'low' values exactly: identical -> D = 0
    # 'half': first 50 match low, next 50 live at 1000+ -> D = 0.5
    for i in range(100):
        for t, v in (
            ("low", float(i)),
            ("high", 1000.0 + i),
            ("same", float(i)),
            ("half", float(i) if i < 50 else 1000.0 + i),
        ):
            rows.append((eid, base, 1, t, v, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    d = {
        (r["type_a"], r["type_b"]): r["d_stat"]
        for r in events_ks_drift(spark, str(tmp_path)).collect()
    }
    assert d[("high", "low")] == 1.0
    assert d[("low", "same")] == 0.0
    assert d[("half", "low")] == 0.5
    assert d[("half", "high")] == 0.5


# --- r13 queue: split-leakage audit ------------------------------------------


def test_leakage_audit_parity_and_consistency(spark, sf_dir):
    """Parity plus composition consistency: the audit's pair total
    must equal the registered miner's pair count (it IS that pair
    set), and off-diagonal classes must exist at sf0.001 (the planted
    near-dups land in different hash buckets — leakage the content
    split provably has, which is this operator's reason to exist)."""
    from adcirctime2cogs_spark.operators.dataprep import (
        _leakage_sql,
        prep_split_leakage_audit,
    )
    from adcirctime2cogs_spark.operators.dedup import dedup_ngram_jaccard

    n = compare(spark, sf_dir, prep_split_leakage_audit, _leakage_sql())
    assert n > 0
    rows = prep_split_leakage_audit(spark, sf_dir).collect()
    assert sum(r["n_pairs"] for r in rows) == dedup_ngram_jaccard(
        spark, sf_dir
    ).count()
    assert sum(r["n_pairs"] for r in rows if r["leaky"] == 1) > 0
    for r in rows:
        assert r["leaky"] == (1 if r["split_a"] != r["split_b"] else 0)
    _no_cartesian(prep_split_leakage_audit(spark, sf_dir))
