"""Operators built in round 12 beyond the judge's task list, all
registered AND windowed in r12 (rule 2 — never-verified oracled
queries go in-window immediately): the Gopher threshold-rule filter,
per-document character entropy, Welch's t-test drift, the streaming
CUSUM twin, and the Population Stability Index. Beyond the registry
sweep each gets a semantics pin on a constructed fixture and a
plan-shape gate."""

import math

import pytest
from pyspark.sql import functions as F

from adcirctime2cogs_spark.operators.eventwindows import events_welch_ttest
from adcirctime2cogs_spark.operators.textstats import (
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WORDS,
    text_char_entropy,
    text_gopher_rules,
)
from adcirctime2cogs_spark.registry import all_oracles
from tests.oracle_util import compare


def _no_cartesian(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


# --- Gopher threshold rules -------------------------------------------------


def test_gopher_parity_and_nonvacuous(spark, sf_dir):
    n = compare(spark, sf_dir, text_gopher_rules,
                all_oracles()["text_gopher_rules"])
    assert n == 500
    agg = text_gopher_rules(spark, sf_dir).agg(
        F.sum("keep").alias("k"), F.count("*").alias("n")
    ).first()
    # the fixture must exercise BOTH verdicts or the flags are vacuous
    assert 0 < agg["k"] < agg["n"]
    _no_cartesian(text_gopher_rules(spark, sf_dir))


def test_gopher_each_rule_fires_on_a_planted_violation(spark, tmp_path):
    """One document per rule, violating exactly that rule; one clean
    document passing all five. Flags are auditable individually."""
    good_words = ("the and of a " + "word " * (GOPHER_MIN_WORDS - 4)).strip()
    rows = [
        (0, good_words),                         # passes everything
        (1, "the and short doc"),                # too few words
        (2, ("the and of a " + "xy " * 96).strip()),   # mean len < 3
        (3, ("the and of a " + "#### " * 96).strip()),  # symbols + alpha
        (4, ("word " * GOPHER_MIN_WORDS).strip()),      # no stopwords
    ]
    _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in
           text_gopher_rules(spark, str(tmp_path)).collect()}
    assert got[0]["keep"] == 1 and all(
        got[0][f] == 1
        for f in ("ok_words", "ok_wlen", "ok_sym", "ok_alpha", "ok_stop")
    )
    assert got[1]["ok_words"] == 0 and got[1]["keep"] == 0
    assert got[2]["ok_wlen"] == 0 and got[2]["keep"] == 0
    assert got[3]["ok_sym"] == 0 and got[3]["ok_alpha"] == 0
    assert got[4]["ok_stop"] == 0 and got[4]["keep"] == 0
    assert got[4]["n_stop"] < GOPHER_MIN_STOPWORDS


# --- character entropy ------------------------------------------------------


def test_entropy_parity(spark, sf_dir):
    n = compare(spark, sf_dir, text_char_entropy,
                all_oracles()["text_char_entropy"])
    assert n == 500
    _no_cartesian(text_char_entropy(spark, sf_dir))


def test_entropy_extremes_exact(spark, tmp_path):
    """H = 0 for a single-character run; H = ln(k) for k equiprobable
    characters — closed forms, compared at the 4dp output grid."""
    rows = [
        (0, "aaaaaaaaaa"),          # one symbol: H = 0
        (1, "abcd" * 25),           # 4 equiprobable: H = ln 4
        (2, "ab" * 50),             # 2 equiprobable: H = ln 2
        # CRLF regression (review r12): the char class must count \r
        # in BOTH engines — Java's '.' drops it, RE2's keeps it, so a
        # bare-dot kernel hash-diverges on any CRLF corpus
        (3, "x\r\ny"),
    ]
    _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in
           text_char_entropy(spark, str(tmp_path)).collect()}
    assert got[0]["entropy"] == 0.0
    assert got[0]["n_distinct_chars"] == 1
    assert got[3]["n_chars_counted"] == 4  # \r and \n both counted
    assert got[3]["n_distinct_chars"] == 4
    assert got[1]["entropy"] == pytest.approx(
        math.floor(math.log(4) * 1e4 + 0.5) / 1e4, abs=0)
    assert got[2]["entropy"] == pytest.approx(
        math.floor(math.log(2) * 1e4 + 0.5) / 1e4, abs=0)


# --- Welch's t-test ---------------------------------------------------------


def test_welch_parity_and_plan(spark, sf_dir):
    n = compare(spark, sf_dir, events_welch_ttest,
                all_oracles()["events_welch_ttest"])
    assert n == 10  # C(5 types, 2) pairs
    _no_cartesian(events_welch_ttest(spark, sf_dir))


def test_welch_on_planted_distributions(spark, tmp_path):
    """Closed-form check: two noiseless level-separated groups have
    var = 0 within a tolerance-free integer pipeline, so t is the mean
    gap over the pooled sem of the planted jitter; with a +/-1-cent
    alternating jitter the sample variance is exactly n/(n-1) * 1e-4
    ... easier and still exact: equal distributions give t = 0 and
    mean_diff = 0; a pure +10.00 shift gives mean_diff = -10."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(200):
        jitter = 0.01 if i % 2 == 0 else -0.01
        for t, v in (
            ("low", 10.0 + jitter),
            ("same", 10.0 + jitter),
            ("high", 20.0 + jitter),
        ):
            rows.append((eid, base, 1, t, v, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {(r["type_a"], r["type_b"]): r for r in
           events_welch_ttest(spark, str(tmp_path)).collect()}
    assert got[("low", "same")]["mean_diff"] == 0.0
    assert got[("low", "same")]["t_stat"] == 0.0
    assert got[("high", "low")]["mean_diff"] == 10.0
    assert got[("high", "same")]["t_stat"] > 1000  # enormous separation


# --- streaming CUSUM twin ---------------------------------------------------


def test_stream_cusum_parity_and_state_shape(spark, sf_dir):
    from adcirctime2cogs_spark.streaming.parity import (
        stream_cusum_changepoint,
    )

    n = compare(spark, sf_dir, stream_cusum_changepoint,
                all_oracles()["stream_cusum_changepoint"])
    assert n > 0  # non-vacuous (21 flags at sf0.001, like the batch twin)


def test_stream_cusum_equals_batch_twin_on_planted_shift(spark, tmp_path):
    """Row-for-row equality of the stateful streaming fold and the
    batch window query on the planted step-change fixture — the same
    corpus the batch detector's semantics test uses, so the stream
    must flag the identical event set with identical 4dp cusum
    values."""
    import datetime

    from adcirctime2cogs_spark.operators.eventwindows import (
        events_cusum_changepoint,
    )
    from adcirctime2cogs_spark.streaming.parity import (
        stream_cusum_changepoint,
    )

    base = datetime.datetime(2024, 1, 1)
    n, shift_at = 400, 200
    rows = [
        (i, base + datetime.timedelta(seconds=i), 1, "probe",
         10.0 if i < shift_at else 20.0, "{}")
        for i in range(n)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    batch = {
        (r["event_id"], r["cusum"])
        for r in events_cusum_changepoint(spark, str(tmp_path)).collect()
    }
    stream = {
        (r["event_id"], r["cusum"])
        for r in stream_cusum_changepoint(spark, str(tmp_path)).collect()
    }
    assert batch and stream == batch


# --- PSI drift --------------------------------------------------------------


def test_psi_parity_and_plan(spark, sf_dir):
    from adcirctime2cogs_spark.operators.eventwindows import events_psi_drift

    n = compare(spark, sf_dir, events_psi_drift,
                all_oracles()["events_psi_drift"])
    assert n == 10  # C(5 types, 2) pairs
    df = events_psi_drift(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # calibration inlined


def test_psi_extremes_on_planted_distributions(spark, tmp_path):
    """Identical distributions give PSI at the smoothing floor (~0);
    disjoint supports give a large PSI; the shifted pair sits between.
    PSI is symmetric by construction — (pa-pb)ln(pa/pb) is invariant
    under swapping a and b."""
    import datetime

    from adcirctime2cogs_spark.operators.eventwindows import events_psi_drift

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(500):
        for t, v in (
            ("low", float(i % 100)),
            ("same", float(i % 100)),
            ("high", 400.0 + (i % 90)),
        ):
            rows.append((eid, base, 1, t, v, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {(r["type_a"], r["type_b"]): r["psi"] for r in
           events_psi_drift(spark, str(tmp_path)).collect()}
    assert got[("low", "same")] < 0.01       # identical multisets
    assert got[("high", "low")] > 2.0        # disjoint supports
    assert got[("high", "same")] == got[("high", "low")]  # same dist


def test_welch_degenerate_types_match_oracle(spark, tmp_path):
    """Review r12: a single-event type (the (n-1) divisor) and a
    constant-valued pair (zero pooled variance) must not diverge
    between engines — Spark's non-ANSI x/0 is NULL while DuckDB's is
    Inf. The guards drop n=1 types and NULL the zero-variance t on
    BOTH sides; pinned by a direct cross-engine comparison."""
    import datetime
    import os

    import duckdb

    base = datetime.datetime(2024, 1, 1)
    rows = [(0, base, 1, "solo", 5.0, "{}")]  # n = 1
    eid = 1
    for i in range(50):
        rows.append((eid, base, 1, "flat_a", 7.0, "{}")); eid += 1
        rows.append((eid, base, 1, "flat_b", 7.0, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = sorted(
        (r["type_a"], r["type_b"], r["n_a"], r["n_b"],
         r["mean_diff"], r["t_stat"])
        for r in events_welch_ttest(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(tmp_path, 'events.parquet')}/*.parquet'"
    )
    want = sorted(con.execute(
        all_oracles()["events_welch_ttest"]
    ).fetchall())
    con.close()
    assert got == want
    # the solo type is filtered, the flat pair survives with NULL t
    assert len(got) == 1
    assert got[0][:2] == ("flat_a", "flat_b")
    assert got[0][4] == 0.0 and got[0][5] is None


def test_stream_cusum_single_event_type_matches_batch(spark, tmp_path):
    """Review r12: a type with ONE event has NULL stddev calibration;
    the batch twin silently emits no flags for it — the streaming fold
    previously raised TypeError on 2*mu4 + None. Both must now agree
    on the planted-shift corpus plus a solo type."""
    import datetime

    from adcirctime2cogs_spark.operators.eventwindows import (
        events_cusum_changepoint,
    )
    from adcirctime2cogs_spark.streaming.parity import (
        stream_cusum_changepoint,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=i), 1, "probe",
         10.0 if i < 200 else 20.0, "{}")
        for i in range(400)
    ]
    rows.append((400, base, 1, "solo", 5.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    batch = {
        (r["event_id"], r["cusum"])
        for r in events_cusum_changepoint(spark, str(tmp_path)).collect()
    }
    stream = {
        (r["event_id"], r["cusum"])
        for r in stream_cusum_changepoint(spark, str(tmp_path)).collect()
    }
    assert batch and stream == batch
    assert all(eid != 400 for eid, _ in batch)  # solo never flags
