"""Evidence pin for the r11 q1_pricing_summary exact-decimal trade
(VERDICT r11 #5): demonstrate the double-sum fold-order divergence the
decimal aggregation prevents, at the group sizes / magnitudes sf10
would produce, so the measured ~+0.24 s at sf0.1 (BASELINE.md) is tied
to a reproducible failure mode rather than narrative.

The mechanism: an sf10 q1 group holds ~15M lineitems with
l_extendedprice up to ~1e5, so the group sum is ~7.5e11 — where one
double ULP is 1.22e-4, LARGER than the 1e-4 spacing of the 4dp output
grid. Spark's partial+final hash aggregation sums partition partials
in a nondeterministic order; any two orders can differ by >= 1 ULP,
so the 4dp-rounded output can differ run-to-run (and engine-to-engine)
on identical data. Exact integer/decimal accumulation is
association-independent, which is why q1 pays the decimal cost.
"""

import math

import numpy as np

N = 15_000_000  # one sf10 q1 group's row count (~60M lineitems / 4)
CHUNKS = 32  # partition partials, as a 32-slot executor would produce


_CACHE = {}


def _values():
    if "v" not in _CACHE:
        rng = np.random.default_rng(7)
        # 2dp money in [900.00, 100000.00) — sf10 l_extendedprice shape
        _CACHE["v"] = np.round(rng.uniform(900.0, 100000.0, N), 2)
    return _CACHE["v"]


def test_double_fold_order_leaks_into_4dp_grid_at_sf10_scale():
    vals = _values()
    partials = np.array(
        [chunk.sum() for chunk in np.array_split(vals, CHUNKS)]
    )
    rng = np.random.default_rng(0)
    rounded = set()
    for _ in range(64):
        order = rng.permutation(CHUNKS)
        total = 0.0
        for i in order:
            total += partials[i]
        rounded.add(math.floor(total * 1e4 + 0.5) / 1e4)
    # the SAME data, summed in different partial orders, rounds to
    # MORE THAN ONE 4dp value — the bug class exact decimal removes
    assert len(rounded) > 1, (
        "expected >=2 distinct 4dp roundings across fold orders; "
        f"got {rounded}"
    )


def test_exact_cents_sum_is_fold_order_invariant_at_same_scale():
    vals = _values()
    cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
    partials = np.array(
        [chunk.sum() for chunk in np.array_split(cents, CHUNKS)],
        dtype=np.int64,
    )
    rng = np.random.default_rng(0)
    totals = set()
    for _ in range(64):
        order = rng.permutation(CHUNKS)
        total = np.int64(0)
        for i in order:
            total += partials[i]
        totals.add(int(total))
    assert len(totals) == 1  # association-independent, any order
    # and the magnitude really is in the danger zone the docstring
    # claims: one ULP of the group sum exceeds the 4dp grid spacing
    group_sum = float(next(iter(totals))) / 100.0
    assert math.ulp(group_sum) > 1e-4
