"""Round-4 scale-property locks.

These institutionalize NOTES rules 21-22: plan-shape audits cannot
catch key-distribution blowups or fixed-cardinality partition keys —
so the properties are asserted on DATA, at two scales where relevant.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_coarse_cells_cardinality_grows_with_corpus(spark):
    """The SemDeDup-family cell key must have MORE distinct cells on a
    larger corpus (the round-3 verdict's fixed-cardinality defect), and
    cell populations must stay ~sqrt-bounded, not corpus-bounded."""
    from map_reduce_spark.operators.similarity import _coarse_cells, _iv4
    from map_reduce_spark.io import load_table

    stats = {}
    # sf0.001 and sf0.01 share the 500-vector embeddings table; sf0.1
    # holds 2000 — that pair exercises actual corpus growth
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        iv = _iv4(load_table(spark, sf_dir, "embeddings"))
        cells = _coarse_cells(iv)
        agg = (
            cells.groupBy("cell")
            .agg(F.count("*").alias("n"))
            .agg(
                F.count("*").alias("n_cells"),
                F.max("n").alias("max_pop"),
                F.sum("n").alias("n_vecs"),
            )
            .collect()[0]
        )
        stats[sf_dir] = agg
    small, big = stats["/root/testdata/sf0.01"], stats["/root/testdata/sf0.1"]
    assert big["n_vecs"] > small["n_vecs"]  # sanity: corpora differ
    # cardinality grows with N (the fix); 10x vectors -> strictly more cells
    assert big["n_cells"] > small["n_cells"], (small, big)
    # population bound: cells over REFINE_THRESH split into ~sqrt(cnt)
    # subcells, so no cell should hold more than ~3*sqrt of the biggest
    # label population (generous: md5-coin seed counts are binomial)
    import math

    label_cap = 3 * math.sqrt(big["n_vecs"] / 10) + 48
    assert big["max_pop"] <= label_cap, (big, label_cap)


def test_deletion_neighborhood_candidates_linear_on_sequential_keys(spark):
    """Regression lock for the round-4 81x finding: on SEQUENTIAL keys
    (the distribution that blew up the two-band blocker quadratically)
    the deletion-neighborhood candidate count must stay O(N) — bounded
    here by c*N with a small constant, where the band blocker produced
    ~N^2/1000 pairs."""
    variants = F.expr(
        "array_union(array(c_name), transform(sequence(1, length(c_name)),"
        " i -> concat(substr(c_name, 1, i - 1),"
        " substr(c_name, i + 1, length(c_name)))))"
    )

    def n_candidates(n: int) -> int:
        rows = [(i, f"User#{i:06d}", 0) for i in range(n)]
        c = spark.createDataFrame(
            rows, "c_custkey long, c_name string, c_nationkey int"
        )
        e = c.select("c_custkey", "c_nationkey", F.explode(variants).alias("v"))
        a, b = e.alias("a"), e.alias("b")
        return (
            a.join(
                b,
                (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
                & (F.col("a.v") == F.col("b.v"))
                & (F.col("a.c_custkey") < F.col("b.c_custkey")),
            )
            .select("a.c_custkey", "b.c_custkey")
            .distinct()
            .count()
        )

    # the SCALING is the property: per-key candidate degree on dense
    # sequential keys is a digit-density constant (~43 here), so 2x
    # keys -> ~2x candidates. The band blocker measured ~4x (bucket
    # populations grow with N -> quadratic pairs).
    n1, n2 = n_candidates(1500), n_candidates(3000)
    assert n2 <= 2.6 * n1, (n1, n2)
    # and the generator still finds the real distance-1 pairs: a
    # consecutive pair differing in one digit must be present, while
    # 09 -> 10 (two digits change) is distance 2 and need not be
    rows = [(i, f"User#{i:06d}", 0) for i in range(100)]
    c = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int"
    )
    e = c.select("c_custkey", "c_nationkey", F.explode(variants).alias("v"))
    a, b = e.alias("a"), e.alias("b")
    pairs = {
        (r[0], r[1])
        for r in a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select("a.c_custkey", "b.c_custkey")
        .distinct()
        .filter(F.col("b.c_custkey") - F.col("a.c_custkey") == 1)
        .collect()
    }
    assert (0, 1) in pairs and (10, 11) in pairs


def test_entity_resolution_catches_indel_variants(spark):
    """The deletion-neighborhood generator extends the recall contract
    to INSERT/DELETE edits (the band blocker only guaranteed
    substitutions on equal-length keys)."""
    from pyspark.sql import functions as F

    rows = [
        (1, "Customer#000000042", 0),
        (2, "Customer#00000042", 0),  # deletion of one '0': distance 1
        (3, "Customer#0000000421", 0),  # insertion: distance 1 vs #1
        (4, "Customer#000000942", 0),  # substitution: distance 1 vs #1
        (5, "Customer#999999999", 0),  # unrelated
    ]
    c = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int"
    )
    variants = F.expr(
        "array_union(array(c_name), transform(sequence(1, length(c_name)),"
        " i -> concat(substr(c_name, 1, i - 1),"
        " substr(c_name, i + 1, length(c_name)))))"
    )
    e = c.select("c_custkey", "c_name", "c_nationkey", F.explode(variants).alias("v"))
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("ka"),
            F.col("b.c_custkey").alias("kb"),
            F.levenshtein("a.c_name", "b.c_name").alias("d"),
        )
        .distinct()
    )
    hits = {(r.ka, r.kb) for r in cand.filter(F.col("d") <= 1).collect()}
    assert {(1, 2), (1, 3), (1, 4)} <= hits
    assert not any(5 in p for p in hits)
