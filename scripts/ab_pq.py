"""Interleaved A/B: old (explode + broadcast join + window) vs new
(per-row broadcast-codebook argmin) pq_encode / pq_adc_topk."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _old_frames(spark, sf_dir):
    from map_reduce_spark.io import load_table
    from map_reduce_spark.operators.similarity import PQ_K, PQ_SUBDIM

    e = load_table(spark, sf_dir, "embeddings")
    iv4 = e.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1e4, 0).cast("long"),
        ).alias("q"),
    )
    terms = iv4.select(
        "vec_id", F.posexplode("q").alias("i0", "qi")
    ).select("vec_id", F.expr(f"i0 div {PQ_SUBDIM}").alias("m"), "i0", "qi")
    cb = terms.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("cid"), "m", "i0", F.col("qi").alias("ci")
    )
    t, c = terms.alias("t"), F.broadcast(cb).alias("c")
    diff = F.col("t.qi") - F.col("c.ci")
    d = (
        t.join(c, (F.col("t.m") == F.col("c.m")) & (F.col("t.i0") == F.col("c.i0")))
        .groupBy("t.vec_id", "t.m", "c.cid")
        .agg(F.sum(diff * diff).alias("d2"))
    )
    return d


def old_pq_encode(spark, sf_dir):
    from map_reduce_spark.operators.similarity import PQ_M

    d = _old_frames(spark, sf_dir)
    w = Window.partitionBy("vec_id", "m").orderBy("d2", "cid")
    best = d.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    code_cols = [
        F.max(F.when(F.col("m") == m, F.col("cid"))).cast("int").alias(f"code{m}")
        for m in range(PQ_M)
    ]
    return best.groupBy("vec_id").agg(
        *code_cols, F.sum("d2").cast("long").alias("recon_err")
    )


def old_pq_adc_topk(spark, sf_dir):
    from map_reduce_spark.session import stage_cache

    d = stage_cache(_old_frames(spark, sf_dir))
    w = Window.partitionBy("vec_id", "m").orderBy("d2", "cid")
    codes = (
        d.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("vec_id", "m", "cid")
    )
    lut = d.filter(F.col("vec_id") == 0).select("m", "cid", F.col("d2").alias("qd2"))
    return (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(lut), ["m", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("qd2").alias("adist"))
        .orderBy("adist", "vec_id")
        .limit(10)
        .select("vec_id", F.col("adist").cast("long").alias("adist"))
    )


def main() -> None:
    from map_reduce_spark.registry import queries
    from map_reduce_spark.session import get_spark, release_caches

    spark = get_spark("ab_pq")
    qs = queries()
    variants = {
        "old_pq_encode": lambda: old_pq_encode(spark, SF_DIR),
        "new_pq_encode": lambda: qs["pq_encode"](spark, SF_DIR),
        "old_pq_adc": lambda: old_pq_adc_topk(spark, SF_DIR),
        "new_pq_adc": lambda: qs["pq_adc_topk"](spark, SF_DIR),
    }
    spark.range(0, 10_000_000, 1, 32).selectExpr(
        "bit_xor(xxhash64(id)) h"
    ).write.format("noop").mode("overwrite").save()
    res: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(11):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            release_caches()
            if rep > 0:
                res[name].append(dt)
    for name, r in res.items():
        s = sorted(r)
        print(
            f"{name}: min {s[0]:.3f} med {s[len(s)//2]:.3f}  all "
            + " ".join(f"{x:.3f}" for x in r)
        )
    spark.stop()


if __name__ == "__main__":
    main()
