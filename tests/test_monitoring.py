"""Semantic properties of the corpus-monitoring family (monitoring.py)
beyond the oracle hash-match that test_oracle_parity already replays.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from map_reduce_spark.registry import all_queries
from map_reduce_spark.session import release_caches


def test_funnel_conserves_mass(spark, sf_dir):
    """Every document lands in exactly one funnel stage: per-source
    stage counts sum to the source's document count, and the dense
    grid always carries all four stages per source."""
    q = all_queries()["curation_funnel"]
    got = q.fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    truth = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    per_source = got.groupby("source")["n_docs"].sum().to_dict()
    assert per_source == truth
    assert (got.groupby("source")["stage"].count() == 4).all()
    release_caches()


def test_psi_nonnegative_and_complete(spark, sf_dir):
    """PSI is a sum of (p-q)*ln(p/q) terms, each individually >= 0, so
    every source's score is >= 0; one row per source."""
    q = all_queries()["drift_psi"]
    got = q.fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_sources = docs.select("source").distinct().count()
    assert len(got) == n_sources
    assert (got["psi"] >= 0).all()
    assert int(got["n_docs"].sum()) == docs.count()
    release_caches()


def test_source_overlap_bounds(spark, sf_dir):
    """All C(n,2) ordered pairs present exactly once; Jaccard within
    [0, 1] and consistent with the intersection count (0 iff no
    common gram)."""
    q = all_queries()["source_overlap"]
    got = q.fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.select("source").distinct().count()
    assert len(got) == n * (n - 1) // 2
    assert (got["src_a"] < got["src_b"]).all()
    assert got["jaccard"].between(0.0, 1.0).all()
    assert ((got["jaccard"] == 0.0) == (got["n_common"] == 0)).all()
    release_caches()


def test_k_anonymity_floor_consistency(spark, sf_dir):
    """k_of_release is the min QI-group size, so risky counts are zero
    exactly when the release's k meets the policy floor; risky_docs
    can never exceed (risky_groups * (K-1))."""
    from map_reduce_spark.operators.monitoring import _K_ANON

    q = all_queries()["k_anonymity"]
    got = q.fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert len(got) == docs.select("lang").distinct().count()
    meets = got["k_of_release"] >= _K_ANON
    assert ((got["risky_groups"] == 0) == meets).all()
    assert (got["risky_docs"] <= got["risky_groups"] * (_K_ANON - 1)).all()
    release_caches()


def test_overlap_minhash_tracks_exact(spark, sf_dir):
    """The K=64 MinHash estimator stays within the standard-error
    envelope of the exact trigram Jaccard on every source pair
    (se <= 1/(2*sqrt(K)) = 0.0625; test at 4 se), and is exactly 0/1
    bounded."""
    qs = all_queries()
    est = qs["source_overlap_minhash"].fn(spark, sf_dir).toPandas()
    exact = qs["source_overlap"].fn(spark, sf_dir).toPandas()
    release_caches()
    m = est.merge(exact, on=["src_a", "src_b"])
    assert len(m) == len(est) == len(exact)
    assert est["est_jaccard"].between(0.0, 1.0).all()
    assert (m["est_jaccard"] - m["jaccard"]).abs().max() <= 0.25


def test_health_report_composes_consistently(spark, sf_dir):
    """The composed report's funnel columns conserve mass against its
    own n_docs, and its PSI column equals the standalone drift_psi."""
    qs = all_queries()
    rep = qs["corpus_health_report"].fn(spark, sf_dir).toPandas()
    psi = qs["drift_psi"].fn(spark, sf_dir).toPandas()
    release_caches()
    stages = rep["kept"] + rep["too_short"] + rep["low_diversity"] + rep["exact_dup"]
    assert (stages == rep["n_docs"]).all()
    m = rep.merge(psi, on="source", suffixes=("", "_solo"))
    assert len(m) == len(rep) == len(psi)
    assert (m["psi"] == m["psi_solo"]).all()
    assert (m["n_docs"] == m["n_docs_solo"]).all()


def _psi_python(counts):
    """Sequential PSI oracle replicating psi_from_counts' math exactly
    (Laplace over 10 bins, 9dp term rounding, 6dp final)."""
    import math

    from map_reduce_spark.operators.monitoring import _PSI_BINS

    n = {}
    o = [0] * _PSI_BINS
    for s, b, c in counts:
        n[s] = n.get(s, 0) + c
        o[b] += c
    t = sum(o)
    out = {}
    for s, ns in n.items():
        psi = 0.0
        for b in range(_PSI_BINS):
            cs = sum(c for s2, b2, c in counts if s2 == s and b2 == b)
            p = (cs + 1.0) / (ns + float(_PSI_BINS))
            q = (o[b] + 1.0) / (t + float(_PSI_BINS))
            psi += round((p - q) * math.log(p / q), 9)
        out[s] = (ns, round(psi, 6))
    return out


def test_psi_from_counts_property(spark):
    """psi_from_counts on arbitrary counts frames: equals the
    sequential formula, and every PSI is non-negative."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from map_reduce_spark.operators.monitoring import _PSI_BINS, psi_from_counts

    counts_strategy = st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2"]),
            st.integers(0, _PSI_BINS - 1),
            st.integers(1, 50),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda x: (x[0], x[1]),
    )

    @settings(max_examples=8, deadline=None)
    @given(counts_strategy)
    def run(counts):
        df = spark.createDataFrame(counts, "source string, bin int, c long")
        got = {
            r.source: (r.n_docs, r.psi) for r in psi_from_counts(df).collect()
        }
        want = _psi_python(counts)
        assert got.keys() == want.keys()
        for s in want:
            assert got[s][0] == want[s][0]
            # tolerance, not equality: JVM Math.log vs libm log can
            # differ by 1 ulp and F.round is HALF_UP while CPython
            # round() is HALF_EVEN — a term sitting on a 5e-10
            # boundary legitimately rounds apart by 1e-9 per bin
            assert abs(got[s][1] - want[s][1]) <= 2e-6
        assert all(p >= 0 for _, p in got.values())

    run()
