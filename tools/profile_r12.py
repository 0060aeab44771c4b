#!/usr/bin/env python
"""Round-12 optimization profiling: isolate the expensive queries'
sub-stages with the noop sink (guide §1.4) and labeled jobs (§1.5).

Each leg times a sub-DataFrame of a headline/tracked query so the
expensive stage can be attributed, not guessed. Run on a quiet machine.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from adcirctime2cogs_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, df, n=3):
    spark.sparkContext.setJobDescription(label)
    best = float("inf")
    cold = None
    for i in range(n):
        t0 = time.perf_counter()
        noop(df)
        w = time.perf_counter() - t0
        cold = cold if cold is not None else w
        best = min(best, w)
    spark.sparkContext.setJobDescription(None)
    print(f"{label:55s} cold={cold:7.3f}  best={best:7.3f}")
    return best


def main() -> None:
    spark = get_spark(app_name="profile_r12")
    which = set(sys.argv[1:]) or {"lsh", "phash", "sim", "q1"}

    if "lsh" in which:
        from adcirctime2cogs_spark.operators import dedup as D

        sh, stop, inter = D._shingle_artifacts(spark, SF_DIR)
        timed(spark, "lsh/sh (shingle explode, cached)", sh)
        aggs = D._mh_aggs()
        stop_marked = stop.withColumn("is_stop", F.lit(True))
        sig_sizes = (
            sh.join(F.broadcast(stop_marked), "sh", "left")
            .groupBy("doc_id")
            .agg(*aggs, F.count(F.when(F.col("is_stop").isNull(), 1)).alias("n"))
        )
        timed(spark, "lsh/sig_sizes (minhash agg, uncached twin)", sig_sizes)
        bands = D._lsh_bands(sig_sizes)
        timed(spark, "lsh/bands", bands)
        cand = D._lsh_candidates(bands)
        timed(spark, "lsh/candidates (window cap + distinct)", cand)
        sh_kept = sh.join(F.broadcast(stop), "sh", "left_anti")
        sh_a = sh_kept.select(F.col("doc_id").alias("doc_a"), "sh")
        sh_b = sh_kept.select(F.col("doc_id").alias("doc_b"), "sh")
        verified = (
            cand.join(sh_a, "doc_a")
            .join(sh_b, ["doc_b", "sh"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("c"))
        )
        timed(spark, "lsh/verified (candidate jaccard-count)", verified)
        timed(spark, "lsh/full query",
              D.dedup_minhash_lsh_pairs(spark, SF_DIR))
        timed(spark, "ngram/full query",
              D.dedup_ngram_jaccard(spark, SF_DIR))

    if "phash" in which:
        from adcirctime2cogs_spark.operators import multimodal as M

        imgs = M.phash_image_docs(spark, SF_DIR)
        timed(spark, "phash/imgs (synth+encode pass)", imgs)
        q = M.mm_image_phash_pairs(spark, SF_DIR)
        timed(spark, "phash/full query", q)

    if "sim" in which:
        from adcirctime2cogs_spark.operators import similarity as S

        pairs = S._probe_pairs(spark, SF_DIR)
        timed(spark, "sim/pairs (cross join, no cosine)", pairs)
        scored = pairs.select(
            "q_id", "c_id",
            S.r4(S.cosine(F.col("q_emb"), F.col("c_emb"))).alias("cos_sim"),
        )
        timed(spark, "sim/scored (per-pair cosine)", scored)
        timed(spark, "sim/full query", S.sim_topk_bruteforce(spark, SF_DIR))

    if "q1" in which:
        from adcirctime2cogs_spark.operators import relational as R
        from adcirctime2cogs_spark.tables import load_table

        li = load_table(spark, SF_DIR, "lineitem")
        timed(spark, "q1/scan only (7 cols)", li.select(
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate"))
        timed(spark, "q1/full query (decimal agg)",
              R.q1_pricing_summary(spark, SF_DIR))


if __name__ == "__main__":
    main()
