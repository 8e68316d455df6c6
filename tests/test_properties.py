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
