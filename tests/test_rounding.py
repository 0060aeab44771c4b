"""The r4/rn / expand_round_sql rounding convention is load-bearing
for every oracle comparison: Spark, DuckDB, and Python must produce
bit-identical doubles for floor(x * 10^d + 0.5) / 10^d. Checked on
seeded-random values plus the adversarial half-boundary family that
originally motivated the convention (functions/numeric.py docstring).
"""

import math

import duckdb
import numpy as np
import pytest

from adcirctime2cogs_spark.functions.numeric import expand_round_sql, r4


def _values():
    rng = np.random.default_rng(42)
    vals = list(rng.uniform(-1000, 1000, 200))
    vals += list(rng.uniform(-0.001, 0.001, 50))
    # half-boundary adversaries: k/2e4 +/- 1 ulp, incl. the documented
    # DuckDB round() mis-round 0.49124999999999996
    for k in (1, 3, 9825, 12345, -7):
        base = k / 20000.0
        vals += [base, math.nextafter(base, -math.inf), math.nextafter(base, math.inf)]
    vals.append(0.49124999999999996)
    return [float(v) for v in vals]


def test_r4_bit_identical_across_engines(spark):
    vals = _values()
    py = [math.floor(v * 10000.0 + 0.5) / 10000.0 for v in vals]

    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = [r.y for r in sdf.select(r4("x").alias("y")).collect()]

    con = duckdb.connect()
    sql = expand_round_sql("SELECT round(x, 4) AS y FROM vals ORDER BY rowid")
    # literals enter as strings: DuckDB parses bare numeric literals
    # through DECIMAL (losing the last ulp on decimal->double), while
    # the oracle tables are parquet DOUBLEs — string->double strtod is
    # the faithful equivalent
    con.execute(
        "CREATE TABLE vals AS SELECT CAST(x AS DOUBLE) AS x FROM (VALUES "
        + ", ".join(f"('{v!r}')" for v in vals)
        + ") t(x)"
    )
    got_duck = [r[0] for r in con.execute(sql).fetchall()]
    con.close()

    assert got_spark == pytest.approx(py, abs=0)  # bit-identical
    assert got_duck == pytest.approx(py, abs=0)


def test_expand_round_sql_rewrites_every_literal_precision():
    """Since review r11 the rewrite generalizes to ANY integer-literal
    digit count (the PQ family rounds at 3dp, subquery_scalar at 2dp),
    so every rounded double an oracle compares is engine-exact."""
    out = expand_round_sql("SELECT round(a + round(b, 4), 4), round(c, 2) FROM t")
    assert out.count("floor(") == 3  # nested 4dp AND the 2dp call
    assert "floor(CAST((c) AS DOUBLE) * 1e2 + 0.5) / 1e2" in out
    out3 = expand_round_sql("SELECT round(adc, 3) FROM t")
    assert out3 == "SELECT floor(CAST((adc) AS DOUBLE) * 1e3 + 0.5) / 1e3 FROM t"


def test_expand_round_sql_property(spark):
    """Property (hypothesis): for any composition of round() calls over
    a generated expression tree, the rewrite (a) removes every
    round(_, 4), (b) leaves every other-precision round untouched, and
    (c) never changes the SQL's value (checked by evaluating both forms
    in DuckDB)."""
    from hypothesis import given, settings, strategies as st

    exprs = st.deferred(
        lambda: st.one_of(
            st.sampled_from(["x", "y", "1.5", "0.25"]),
            st.tuples(exprs, exprs).map(lambda t: f"({t[0]} + {t[1]})"),
            st.tuples(exprs, st.sampled_from([2, 4, 6])).map(
                lambda t: f"round({t[0]}, {t[1]})"
            ),
        )
    )

    @settings(max_examples=60, deadline=None, derandomize=True)
    @given(exprs)
    def check(e):
        out = expand_round_sql(e)
        # (a)+(b): NO literal-digit round() survives the rewrite
        assert "round(" not in out, out
        # (c): value-preserving
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT 1.2345678::DOUBLE x, -0.5::DOUBLE y")
        a = con.execute(f"SELECT {e} FROM t").fetchone()[0]
        b = con.execute(f"SELECT {out} FROM t").fetchone()[0]
        con.close()
        assert a == pytest.approx(b, abs=1e-12)

    check()


def test_expand_round_sql_nested_and_word_boundary():
    """Regressions: nested rounds expand inside-out; identifiers merely
    ENDING in 'round' (bround, workaround) must not be corrupted; a
    non-literal digit argument keeps native round but its INNER
    literal rounds still expand."""
    assert expand_round_sql("SELECT round(round(x, 4), 2) FROM t") == (
        "SELECT floor(CAST((floor(CAST((x) AS DOUBLE) * 1e4 + 0.5) / 1e4)"
        " AS DOUBLE) * 1e2 + 0.5) / 1e2 FROM t"
    )
    assert expand_round_sql("SELECT round(round(x, 4), d) FROM t") == (
        "SELECT round(floor(CAST((x) AS DOUBLE) * 1e4 + 0.5) / 1e4, d) FROM t"
    )
    assert (
        expand_round_sql("SELECT bround(x, 4) FROM t")
        == "SELECT bround(x, 4) FROM t"
    )
    assert (
        expand_round_sql("SELECT workaround(x, 4) FROM t")
        == "SELECT workaround(x, 4) FROM t"
    )
