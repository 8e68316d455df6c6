"""Semantic tests for the round-3 operator additions, beyond the
auto-generated oracle-parity rows: CMS one-sided error, BPE merge-loop
invariants, SemDeDup verdict consistency, and the entity-resolution
banding-vs-quadratic recall guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_count_min_never_underestimates(spark, sf_dir):
    """CMS is one-sided: est >= exact for EVERY queried term, and the
    total overestimate respects the eps*N bound with slack."""
    from map_reduce_spark.operators.corpus_quality import (
        _CMS_WIDTH,
        count_min_freq,
    )
    from map_reduce_spark.io import load_table

    rows = count_min_freq(spark, sf_dir).collect()
    assert rows, "heavy-hitter query set must be non-empty"
    assert all(r.cms_est >= r.exact_count for r in rows)
    assert all(r.overestimate == r.cms_est - r.exact_count for r in rows)

    n = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .count()
    )
    # expected collision mass per cell is N/w; with d=4 independent
    # rows the min is far below that — allow 4x slack per term
    assert all(r.overestimate <= 4 * n / _CMS_WIDTH for r in rows)


def test_bpe_merges_shrink_corpus_monotonically(spark, sf_dir):
    """Each BPE round merges the argmax pair: pair frequencies are
    non-increasing across rounds (greedy argmax on a shrinking corpus
    can never find a strictly better pair later than an earlier round
    ignored), vocab grows by at most 1 symbol per round, and every
    merged symbol is the concatenation of its parts."""
    from map_reduce_spark.operators.corpus_quality import (
        _BPE_TRAIN_ROUNDS,
        bpe_train_merges,
    )

    rows = sorted(bpe_train_merges(spark, sf_dir).collect(), key=lambda r: r.round)
    assert [r.round for r in rows] == list(range(1, _BPE_TRAIN_ROUNDS + 1))
    freqs = [r.pair_freq for r in rows]
    assert all(a >= b for a, b in zip(freqs, freqs[1:])), freqs
    assert all(r.pair_freq > 0 for r in rows)
    # each round adds the merged symbol and may exhaust its parts:
    # vocab can grow by at most one net symbol per round
    sizes = [r.vocab_size_after for r in rows]
    assert all(abs(a - b) <= 2 for a, b in zip(sizes, sizes[1:]))


def test_semdedup_verdicts_match_bruteforce(spark, sf_dir):
    """The keep/drop frontier equals the definition recomputed
    driver-side from the query's own cell and cosine columns."""
    from map_reduce_spark.operators.similarity import (
        SEMDEDUP_TAU,
        dedup_semantic,
    )

    rows = dedup_semantic(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.max_prev_cos is None:
            assert r.kept, "a vector with no lower-id neighbor is always kept"
        else:
            assert r.kept == (r.max_prev_cos < SEMDEDUP_TAU) or abs(
                r.max_prev_cos - SEMDEDUP_TAU
            ) < 1e-6, (r.vec_id, r.max_prev_cos, r.kept)


def test_entity_resolution_banding_equals_quadratic(spark, sf_dir):
    """The two-band candidate generator loses NOTHING vs the naive
    nation-blocked quadratic comparison (the pigeonhole guarantee)."""
    from map_reduce_spark.operators.advanced_joins import (
        _ER_MAX_DIST,
        entity_resolution,
    )
    from map_reduce_spark.io import load_table

    banded = {
        (r.custkey_a, r.custkey_b, r.dist)
        for r in entity_resolution(spark, sf_dir).collect()
    }

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    a, b = c.alias("a"), c.alias("b")
    naive = {
        (r.ka, r.kb, r.dist)
        for r in (
            a.join(
                b,
                (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
                & (F.col("a.c_custkey") < F.col("b.c_custkey")),
            )
            .select(
                F.col("a.c_custkey").alias("ka"),
                F.col("b.c_custkey").alias("kb"),
                F.levenshtein("a.c_name", "b.c_name").cast("int").alias("dist"),
            )
            .filter(F.col("dist") <= _ER_MAX_DIST)
        ).collect()
    }
    assert banded == naive


def test_bpe_encode_count_invariants(spark, sf_dir):
    """Per doc: word count <= BPE tokens <= chars (merges only ever
    shrink a word's symbol count, never below 1 symbol per word)."""
    from map_reduce_spark.operators.corpus_quality import bpe_encode

    rows = bpe_encode(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_words <= r.n_tokens_bpe <= r.n_chars, (
            r.doc_id,
            r.n_words,
            r.n_tokens_bpe,
            r.n_chars,
        )


def test_knn_graph_shape(spark, sf_dir):
    """No self-edges, ranks are 1..k per vector, cosine within [-1, 1]
    and non-increasing along each vector's rank order."""
    from collections import defaultdict

    from map_reduce_spark.operators.similarity import KNN_K, knn_graph

    rows = knn_graph(spark, sf_dir).collect()
    assert rows
    by_vec = defaultdict(list)
    for r in rows:
        assert r.nbr_id != r.vec_id
        assert -1.0 - 1e-9 <= r.cos <= 1.0 + 1e-9
        by_vec[r.vec_id].append((r.rnk, r.cos))
    for vec, lst in by_vec.items():
        lst.sort()
        assert [rk for rk, _ in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= KNN_K
        coss = [c for _, c in lst]
        assert all(a >= b for a, b in zip(coss, coss[1:])), (vec, coss)


def test_winsorize_clip_fractions(spark, sf_dir):
    """Each tail clips at most ~5% of the rows (interpolated p05/p95
    thresholds can clip slightly under, never meaningfully over)."""
    from map_reduce_spark.operators.analytics import winsorize_values

    rows = winsorize_values(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_clipped_low <= r.n * 0.05 + 1
        assert r.n_clipped_high <= r.n * 0.05 + 1
        assert r.winsorized_mean is not None


def test_python_datasource_write_commit_protocol(spark):
    """After the write: the manifest exists, every manifest file is
    published (no orphan staging), and the landed rows equal the
    source exactly once."""
    import json
    import os

    from map_reduce_spark.operators.python_source import (
        _N_ROWS,
        python_datasource_write,
    )

    df = python_datasource_write(spark, "unused")
    out = df.collect()
    assert sum(r.cnt for r in out) == _N_ROWS

    # this run's own uuid dir, recovered from the result frame itself
    # (inputFiles of the manifest read-back) — no shared module global
    committed = [os.path.normpath(f.removeprefix("file:")) for f in df.inputFiles()]
    assert committed, "result frame must expose the committed files"
    sink = os.path.dirname(committed[0])
    with open(os.path.join(sink, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["rows"] == _N_ROWS
    for name in manifest["files"]:
        assert os.path.exists(os.path.join(sink, name))
    staging = os.path.join(sink, "_staging")
    assert not os.listdir(staging), "staging must be empty after commit"


def _double_replace_merge(tokens, x, y):
    """The exact string transform both engines run per BPE round:
    pad, two left-to-right literal replaces, trim, re-split."""
    s = " " + " ".join(tokens) + " "
    pat, rep = f" {x} {y} ", f" {x}{y} "
    s = s.replace(pat, rep).replace(pat, rep)
    return s.strip().split(" ")


def _greedy_merge(tokens, x, y):
    """Reference greedy non-overlapping left-to-right pair merge."""
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == x and tokens[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def test_bpe_double_replace_equals_greedy_merge():
    """The two-pass literal-replace trick (the per-round merge both the
    Spark code and the DuckDB oracle apply) must equal canonical greedy
    non-overlapping merging for every x != y pair — the claim the BPE
    operators' docstrings make. Exhaustive over all 4-symbol sequences
    up to length 8 plus hypothesis-style random longer ones."""
    import itertools
    import random

    syms = ["a", "b", "ab", "c"]
    for n in range(1, 9):
        for tokens in itertools.product(syms, repeat=n):
            for x, y in itertools.permutations(syms, 2):
                got = _double_replace_merge(list(tokens), x, y)
                want = _greedy_merge(list(tokens), x, y)
                assert got == want, (tokens, x, y, got, want)

    rng = random.Random(7)
    for _ in range(500):
        tokens = [rng.choice(syms) for _ in range(rng.randint(9, 40))]
        x, y = rng.sample(syms, 2)
        assert _double_replace_merge(tokens, x, y) == _greedy_merge(tokens, x, y)


def test_bpe_double_replace_self_pair_is_valid_merging():
    """For x == y (self-overlapping) the double replace can achieve
    FEWER merges than canonical greedy on long runs ('a'*6 merges 2
    pairs, not 3 — boundary spaces consumed by pass 1 isolate the
    leftovers) — but it must still be a VALID and LOCALLY MAXIMAL
    non-overlapping merging: decomposing the result reproduces the
    input, and no adjacent unmerged (x, x) pair survives. Both engines
    run the identical transform, so the deviation is deterministic
    (documented in bpe_train_merges)."""
    import itertools

    for n in range(1, 12):
        for tokens in itertools.product(["a", "b"], repeat=n):
            got = _double_replace_merge(list(tokens), "a", "a")
            decompose = [
                c for t in got for c in ([t] if t != "aa" else ["a", "a"])
            ]
            assert decompose == list(tokens)
            assert not any(
                got[i] == "a" and got[i + 1] == "a" for i in range(len(got) - 1)
            ), (tokens, got)
