"""Registry contracts: the 50-slot window invariant and the
prepared-plan cache semantics (hit on same data, evict on new data,
opt-out for self-invalidating queries)."""

import os
import shutil

from adcirctime2cogs_spark import registry


def test_window_is_exactly_50_with_oracles():
    qs = registry.all_queries()
    oracles = registry.all_oracles()
    window = list(qs)[:50]
    assert len(registry._PRIORITY) == 50
    assert window == registry._PRIORITY
    missing = [n for n in window if n not in oracles]
    assert not missing, f"window entries without oracle: {missing}"


def test_plan_cache_hits_and_data_eviction(spark, sf_dir, tmp_path):
    qs = registry.all_queries()
    fn = qs["scalar_math"]
    # copy the fixture so touching files can't disturb other tests
    local = str(tmp_path / "sfcopy")
    shutil.copytree(sf_dir, local)
    a = fn(spark, local)
    b = fn(spark, local)
    assert a is b  # prepared-plan hit: same DataFrame object
    # bump the data version -> the cache must hand out a fresh plan
    probe = next(
        os.path.join(local, f) for f in os.listdir(local)
        if f.endswith(".parquet")
    )
    os.utime(probe)  # "now" strictly exceeds the fixture's max mtime
    c = fn(spark, local)
    assert c is not a
    # and the superseded entry was evicted, not leaked
    keys = [k for k in registry._PLAN_CACHE if k[0] == "scalar_math"
            and k[2] == local]
    assert len(keys) == 1


def test_plan_cache_exempts_self_invalidating_queries(spark, sf_dir):
    qs = registry.all_queries()
    a = qs["join_bucketed"](spark, sf_dir)
    b = qs["join_bucketed"](spark, sf_dir)
    # every call rewrites its bucketed tables, so the registry must
    # never serve a previously returned (now stale-listing) plan
    assert a is not b
    assert b.count() > 0  # and the fresh plan is readable end to end
