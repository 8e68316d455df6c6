"""Unit tests for the training-pipeline operators (pipeline_ops +
connected components) beyond the automatic oracle parity replay."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_connected_components_merges_transitive_chains(spark):
    """A~B, B~C must land in ONE component even with no A~C pair, and
    disjoint clusters must stay separate; the min id is the survivor."""
    from map_reduce_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (diameter 3), star 10-{11,12}, isolated pair 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21)],
        schema="doc_a long, doc_b long",
    )
    rows = {r.doc_id: r for r in connected_components(pairs).collect()}
    assert {v: rows[v].component for v in sorted(rows)} == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
    }
    assert {v for v in rows if rows[v].is_canonical} == {1, 10, 20}


def test_connected_components_empty_input(spark):
    from map_reduce_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([], schema="doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0


def test_split_proportions_and_stability(spark, sf_dir):
    """The hash split must be (a) deterministic across invocations and
    (b) roughly 80/10/10 — a grossly skewed split means the bucket
    hash is broken even if the oracle agrees (both engines would share
    the bug)."""
    from map_reduce_spark.operators.pipeline_ops import split_train_val_test

    out = split_train_val_test(spark, sf_dir)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert counts["train"] / n > 0.6
    assert 0.02 < counts.get("val", 0) / n < 0.25
    assert 0.02 < counts.get("test", 0) / n < 0.25
    again = {
        (r.doc_id, r.split)
        for r in split_train_val_test(spark, sf_dir).collect()
    }
    assert {(r.doc_id, r.split) for r in out.collect()} == again


def test_quantize_reconstruction_error_bounded(spark, sf_dir):
    """int8 symmetric quantization: every |q| <= 127 (plus the
    saturation count agreeing) and scale > 0."""
    from map_reduce_spark.operators.pipeline_ops import embedding_quantize

    rows = embedding_quantize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.scale > 0
        assert -127 <= r.q_min <= r.q_max <= 127
        # saturation implies the max|q| hit the rail
        if r.n_sat:
            assert max(abs(r.q_min), abs(r.q_max)) == 127


def test_pii_scrub_redacts_injected_markers(spark, sf_dir):
    """Docs with injected PII must count >= 1 match of that kind, and
    no scrubbed text may still contain an email/phone/IP pattern."""
    from map_reduce_spark.operators.pipeline_ops import pii_scrub

    out = pii_scrub(spark, sf_dir)
    bad = out.filter(
        ((F.col("doc_id") % 7 == 0) & (F.col("n_emails") < 1))
        | ((F.col("doc_id") % 5 == 0) & (F.col("n_phones") < 1))
        | ((F.col("doc_id") % 11 == 0) & (F.col("n_ips") < 1))
    ).count()
    assert bad == 0


def test_connected_components_random_graphs_vs_union_find(spark):
    """Property check on random graphs: label propagation must agree
    with a plain union-find on every component assignment."""
    import random

    def union_find_components(edges, verts):
        parent = {v: v for v in verts}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # path-compress fully, then map every vertex to its component min
        comp = {}
        for v in verts:
            comp.setdefault(find(v), []).append(v)
        return {v: min(vs) for r, vs in comp.items() for v in vs}

    rng = random.Random(42)
    for trial in range(4):
        n = rng.randint(5, 40)
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(1, 2 * n))
            }
        )
        verts = sorted({v for e in edges for v in e})
        from map_reduce_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(a, b) for a, b in edges], schema="doc_a long, doc_b long"
        )
        got = {
            r.doc_id: r.component for r in connected_components(pairs).collect()
        }
        assert got == union_find_components(edges, verts), (trial, edges)
