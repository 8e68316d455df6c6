"""Interleaved A/B: old (explode+join+window) vs new (broadcast
centroid-array + min-struct) ivf_assign / ivf_topk shapes. Min-of-warm
over interleaved reps, immune to slow host drift."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_ivf_assign(spark, sf_dir):
    from map_reduce_spark.io import load_table

    e = load_table(spark, sf_dir, "embeddings")
    iv = e.select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1e4, 0).cast("long"),
        ).alias("q"),
    )
    terms = iv.select(
        "vec_id", "label", F.posexplode("q").alias("i0", "qi")
    ).select("vec_id", "label", (F.col("i0") + 1).alias("i"), "qi")
    cent = terms.groupBy(F.col("label").alias("clabel"), "i").agg(
        F.sum("qi").alias("s"), F.count("*").alias("n")
    )
    t, c = terms.alias("t"), F.broadcast(cent).alias("c")
    num = F.col("c.n") * F.col("t.qi") - F.col("c.s")
    d = (
        t.join(c, F.col("t.i") == F.col("c.i"))
        .groupBy("t.vec_id", "c.clabel", "c.n")
        .agg(F.sum(num * num).alias("num2"))
        .select(
            F.col("vec_id"),
            F.col("clabel"),
            (F.col("num2").cast("double") / (F.col("n") * F.col("n"))).alias("d2"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "clabel")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "vec_id",
            F.col("clabel").alias("assigned_label"),
            F.round(F.col("d2") / 1e8, 6).alias("dist2"),
        )
    )


def perrow_ivf_assign(spark, sf_dir):
    """Variant D: one-row broadcast of ALL label centroid arrays; the
    argmin is computed per row (array_min over label structs) — no
    distance shuffle, no window, fully narrow after the centroid agg."""
    from map_reduce_spark.io import load_table
    from map_reduce_spark.operators.similarity import _cent_arrays, _iv4

    e = load_table(spark, sf_dir, "embeddings")
    iv = _iv4(e)
    cents = _cent_arrays(iv).agg(
        F.array_sort(F.collect_list(F.struct("clabel", "s_arr", "n"))).alias("cs")
    )

    def d2(c):
        num2 = F.aggregate(
            F.zip_with(
                F.col("q"),
                c["s_arr"],
                lambda qi, si: (c["n"] * qi - si) * (c["n"] * qi - si),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        return num2.cast("double") / (c["n"] * c["n"])

    best = F.array_min(
        F.transform(F.col("cs"), lambda c: F.struct(d2(c).alias("d2"), c["clabel"].alias("clabel")))
    )
    return (
        iv.crossJoin(F.broadcast(cents))
        .select("vec_id", best.alias("mn"))
        .select(
            "vec_id",
            F.col("mn.clabel").alias("assigned_label"),
            F.round(F.col("mn.d2") / 1e8, 6).alias("dist2"),
        )
    )



IVF_NPROBE = 3


def old_ivf_topk(spark, sf_dir):
    from map_reduce_spark.io import load_table
    from map_reduce_spark.operators.dedup import _idot, _ivec
    from map_reduce_spark.session import stage_cache

    e = load_table(spark, sf_dir, "embeddings")
    iv4 = e.select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1e4, 0).cast("long"),
        ).alias("q"),
    )
    terms = iv4.select(
        "vec_id", "label", F.posexplode("q").alias("i0", "qi")
    ).select("vec_id", "label", (F.col("i0") + 1).alias("i"), "qi")
    cent = terms.groupBy(F.col("label").alias("clabel"), "i").agg(
        F.sum("qi").alias("s"), F.count("*").alias("n")
    )
    t, c = terms.alias("t"), F.broadcast(cent).alias("c")
    num = F.col("c.n") * F.col("t.qi") - F.col("c.s")
    d = (
        t.join(c, F.col("t.i") == F.col("c.i"))
        .groupBy("t.vec_id", "c.clabel", "c.n")
        .agg(F.sum(num * num).alias("num2"))
        .select(
            "vec_id",
            "clabel",
            (F.col("num2").cast("double") / (F.col("n") * F.col("n"))).alias("d2"),
        )
    )
    d = stage_cache(d)
    wv = Window.partitionBy("vec_id").orderBy("d2", "clabel")
    assign = (
        d.withColumn("rn", F.row_number().over(wv))
        .filter("rn = 1")
        .select("vec_id", "clabel")
    )
    wq = Window.orderBy("d2", "clabel")
    qprobe = (
        d.filter(F.col("vec_id") == 0)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= IVF_NPROBE)
        .select("clabel")
    )
    nv = e.select("vec_id", _ivec("embedding").alias("q")).withColumn(
        "nrm", F.sqrt(_idot(F.col("q"), F.col("q")).cast("double"))
    )
    qv = nv.filter(F.col("vec_id") == 0).select(
        F.col("q").alias("qq"), F.col("nrm").alias("qnrm")
    )
    cand = assign.join(F.broadcast(qprobe), "clabel").filter(F.col("vec_id") != 0)
    cos = _idot(F.col("q"), F.col("qq")).cast("double") / (
        F.col("nrm") * F.col("qnrm")
    )
    return (
        nv.join(cand, "vec_id")
        .crossJoin(F.broadcast(qv))
        .select("vec_id", F.col("clabel").alias("cell"), cos.alias("cos_x"))
        .orderBy(F.desc("cos_x"), "vec_id")
        .limit(10)
        .select("vec_id", "cell", F.round("cos_x", 6).alias("cos"))
    )


def main() -> None:
    from map_reduce_spark.registry import queries
    from map_reduce_spark.session import get_spark, release_caches

    spark = get_spark("ab_ivf")
    qs = queries()
    variants = {
        "old_topk": lambda: old_ivf_topk(spark, SF_DIR),
        "new_topk": lambda: qs["ivf_topk"](spark, SF_DIR),
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
        print(f"{name}: min {min(r):.3f}  all " + " ".join(f"{x:.3f}" for x in r))
    spark.stop()


if __name__ == "__main__":
    main()
