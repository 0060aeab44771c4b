#!/usr/bin/env python
"""Converged-run column for the bench sets (VERDICT r12 item 7).

The frozen bench's min-of-3 under-warms deep multi-stage plans: C2
JIT compilation needs ~6-8 executions to converge on them (measured
r12: dedup_minhash_lsh_pairs 11 -> 1.0 s over 8 runs), so cross-round
comparisons systematically penalize the deepest plans. This tool runs
every HEADLINE+TRACKED query N times in one session and reports both
the bench-equivalent min-of-first-3 and the converged min-of-last-3,
so the round doc can show the gap. Measurement-side only — bench.py
and its frozen protocol are untouched.

Usage: SPARK_GRAFT_CPUS=32 python tools/converged_bench.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    import bench
    from adcirctime2cogs_spark import registry
    from adcirctime2cogs_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="converged_bench")
    queries = registry.all_queries()
    out = {}
    for name in bench.HEADLINE + bench.TRACKED:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"converged:{name}")
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "runs": walls,
            "min_first3": min(walls[:3]),
            "min_last3": min(walls[-3:]),
        }
        print(f"# {name}: first3 {out[name]['min_first3']} "
              f"last3 {out[name]['min_last3']}", file=sys.stderr)
    print(json.dumps({
        "metric": "converged_bench",
        "sf_dir": sf_dir,
        "runs_per_query": runs,
        "queries": out,
        "load1": open("/proc/loadavg").read().split()[0],
    }))


if __name__ == "__main__":
    main()
