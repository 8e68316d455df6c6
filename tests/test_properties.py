"""Property-based differential tests (hypothesis) — the reference's
testing strategy (sequential oracle vs engine, SURVEY §5) generalized:
random inputs, a trivial in-Python oracle, the Spark implementation
must agree exactly."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import given, settings, strategies as st

TOKEN_SEP = re.compile(r"[^a-zA-Z]")

corpus_strategy = st.lists(
    st.text(
        alphabet=st.sampled_from("abcXY z.,'1\n"),
        max_size=80,
    ),
    min_size=1,
    max_size=6,
)


def python_word_count(files: list[str]) -> dict[str, int]:
    """The sequential oracle, verbatim reference semantics
    (mr_sequential.ex + word_count.ex): split on [^a-zA-Z], drop
    empties, uppercase, count."""
    c: Counter = Counter()
    for content in files:
        for w in TOKEN_SEP.split(content):
            if w != "":
                c[w.upper()] += 1
    return dict(c)


@settings(max_examples=15, deadline=None)
@given(corpus_strategy)
def test_run_job_matches_python_oracle(spark, tmp_path_factory, files):
    from map_reduce_spark.mapreduce import word_count

    d = tmp_path_factory.mktemp("hyp")
    for i, content in enumerate(files):
        (d / f"f{i}.txt").write_text(content or " ", encoding="utf-8")

    got = dict(word_count(spark, str(d)).collect())
    # read back what was actually written (empty string -> " ")
    written = [(d / f"f{i}.txt").read_text(encoding="utf-8") for i in range(len(files))]
    assert got == python_word_count(written)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(-100, 100)),
        min_size=0,
        max_size=50,
    )
)
def test_dataframe_groupby_sum_matches_python(spark, pairs):
    """groupBy-sum over random (key, value) pairs == Python fold."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pairs or [(0, 0)], "k int, v long")
    got = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    want: dict[int, int] = {}
    for k, v in pairs or [(0, 0)]:
        want[k] = want.get(k, 0) + v
    assert got == want


def test_band_join_bucket_rewrite_matches_naive_incl_negative_epochs(spark):
    """The 3-bucket equi-join rewrite must produce EXACTLY the naive
    |ta-tb| < W pair set — including negative timestamps, where a
    toward-zero division would mis-bucket (floor(-1/W) = -1, not 0)."""
    import random

    from map_reduce_spark.operators.advanced_joins import band_join_frames

    random.seed(13)
    W = 1000
    users = list(range(6))
    a_rows = [
        (i, random.choice(users), random.randrange(-5000, 5000))
        for i in range(120)
    ]
    b_rows = [
        (1000 + i, random.choice(users), random.randrange(-5000, 5000))
        for i in range(120)
    ]
    a = spark.createDataFrame(a_rows, "err_id long, user_id long, ta long")
    b = spark.createDataFrame(b_rows, "buy_id long, user_id long, tb long")
    got = {
        (r.user_id, r.err_id, r.buy_id, r.gap_us)
        for r in band_join_frames(a, b, W).collect()
    }
    want = {
        (ua, ea, bb, tb - ta)
        for ea, ua, ta in a_rows
        for bb, ub, tb in b_rows
        if ua == ub and abs(ta - tb) < W
    }
    assert got == want and len(want) > 50


@settings(max_examples=6, deadline=None)
@given(st.data())
def test_delta_log_lifecycle_state_invariant(spark, tmp_path_factory, data):
    """Random walks over the Delta log lifecycle — appends, COW
    deletes, checkpoint cuts, retention cleanup, vacuum — against a
    dict model: maintenance ops (clean_delta_log, vacuum_delta) must
    NEVER change the readable state, vacuum must sweep nothing on an
    orphan-free table, and every version neither in the json log nor
    checkpointed must refuse time travel (no silent partial replay)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    import map_reduce_spark.sources.delta_py as D

    tbl = str(tmp_path_factory.mktemp("lifecycle") / "t")

    def frame(ids):
        return spark.createDataFrame(
            [(i, i * 7) for i in ids], "id long, v long"
        )

    D.write_delta_py(frame(range(4)), tbl, mode="overwrite",
                     checkpoint_interval=0)  # v0
    D.set_delta_table_property(tbl, "delta.enableChangeDataFeed", "true")  # v1
    model = {i: i * 7 for i in range(4)}
    next_id = 4
    for _ in range(data.draw(st.integers(3, 6))):
        op = data.draw(st.sampled_from(
            ["append", "append", "delete", "ckpt_append", "clean", "vacuum"]
        ))
        if op == "append":
            k = data.draw(st.integers(1, 3))
            new = list(range(next_id, next_id + k))
            next_id += k
            D.write_delta_py(frame(new), tbl, checkpoint_interval=0)
            model.update({i: i * 7 for i in new})
        elif op == "ckpt_append":
            new = [next_id]
            next_id += 1
            D.write_delta_py(frame(new), tbl, checkpoint_interval=1)
            model.update({i: i * 7 for i in new})
        elif op == "delete" and model:
            victim = data.draw(st.sampled_from(sorted(model)))
            D.delete_where(spark, tbl, F.col("id") == victim,
                           checkpoint_interval=0)
            model.pop(victim)
        elif op == "clean":
            D.clean_delta_log(tbl, retain_last=data.draw(st.integers(0, 2)))
        elif op == "vacuum":
            assert D.vacuum_delta(tbl) == 0
        got = {r.id: r.v for r in D.read_delta_py(spark, tbl).collect()}
        assert got == model, f"after {op}"
    js, cps = D._list_log(tbl)
    latest = max(js[-1:] + cps[-1:])
    jset = set(js)
    # Reconstructible = checkpointed, seedable from a checkpoint <= v
    # with the (c, v] json tail intact, or reachable from genesis with
    # json [0, v] intact. A json commit retained by clean_delta_log's
    # retain_last tail WITHOUT such a seed serves the change feed only
    # — snapshot must refuse it loudly, not partially replay.
    for v in range(latest + 1):
        reconstructible = (
            v in cps
            or any(
                c <= v and all(x in jset for x in range(c + 1, v + 1))
                for c in cps
            )
            or (v in jset and all(x in jset for x in range(0, v + 1)))
        )
        if reconstructible:
            D.snapshot(tbl, v)  # must reconstruct
        else:
            with _pytest.raises((ValueError, FileNotFoundError)):
                D.snapshot(tbl, v)
