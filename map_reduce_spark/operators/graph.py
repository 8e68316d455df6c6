"""Graph analytics over the token co-occurrence graph: TextRank
keyword extraction (integer PageRank) and triangle counting.

Not in the reference (word count only); these are the graph shapes a
corpus-analytics engine needs — TextRank is THE classic unsupervised
keyword extractor (Mihalcea & Tarau 2004, public), and triangle count
is the standard clustering-coefficient building block.

The graph: undirected edges between tokens ADJACENT in a document
(distinct bigrams, both orientations), built with the engine's
tokenizer contract (split on [^a-zA-Z], wordcount.py). Cheap to build
at any scale: explode + self-join-free lead() pairing + distinct.

Cross-engine determinism — INTEGER PageRank: ranks are scaled BIGINTs
(SCALE = 1e9) and every update is integer arithmetic only::

    contrib(v) = rank(v) div outdeg(v)
    rank'(v)   = (15 * SCALE) div 100  +  (85 * sum_in(contrib)) div 100

Floor division and int64 sums are bit-identical in Spark (`div`) and
DuckDB (`//`) — no float summation anywhere, so a 5-iteration fixpoint
hash-matches the oracle exactly. Overflow headroom: 85 * mass fits
int64 up to ~1e8 distinct tokens x SCALE; beyond that the documented
escalation is DECIMAL(38,0) sums (NOTES rule 2).

Scale notes: each iteration is one join (edges x ranks on src — ranks
is vocabulary-sized, broadcastable in practice) + one partial-agg'd
groupBy dst. Iterations localCheckpoint per NOTES rule 12 (bounded
loop, lineage reset). Triangle counting uses the oriented-edge trick
(src < dst everywhere) so each triangle is counted exactly once, and
the standard degree-ordering optimization is the documented escalation
for skewed (power-law) graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table, parallelize_if_narrow
from map_reduce_spark.registry import register
from map_reduce_spark.session import stage_cache, stage_checkpoint

SCALE = 1_000_000_000
_ITER = 5
_TOPK = 20

# DuckDB-side tokenization with positions (mirrors wordcount's
# regexp_split_to_array contract; generate_subscripts gives ordinality)
_TOK_CTE = """
tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(text, '[^a-zA-Z]')) AS t,
         generate_subscripts(regexp_split_to_array(text, '[^a-zA-Z]'), 1) AS pos
  FROM documents
),
bigram AS (
  SELECT a.doc_id, a.t AS t1, b.t AS t2
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.t <> '' AND b.t <> '' AND a.t <> b.t
),
edges AS (
  SELECT DISTINCT LEAST(t1, t2) AS src, GREATEST(t1, t2) AS dst FROM bigram
),
arcs AS (
  SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
)
"""


def _pagerank_oracle() -> str:
    it = [
        f"""deg AS (SELECT src, COUNT(*) AS outdeg FROM arcs GROUP BY src),
r0 AS (SELECT src AS node, CAST({SCALE} AS BIGINT) AS rank FROM deg)"""
    ]
    for k in range(1, _ITER + 1):
        it.append(
            f"""r{k} AS (
  SELECT a.dst AS node,
         CAST({15 * SCALE // 100}
              + (85 * CAST(SUM(r.rank // d.outdeg) AS BIGINT)) // 100
           AS BIGINT) AS rank
  FROM arcs a
  JOIN r{k - 1} r ON a.src = r.node
  JOIN deg d ON a.src = d.src
  GROUP BY a.dst
)"""
        )
    return (
        "WITH "
        + _TOK_CTE.strip().rstrip()
        + ",\n"
        + ",\n".join(it)
        + f"\nSELECT node AS token, rank FROM r{_ITER} "
        f"ORDER BY rank DESC, token LIMIT {_TOPK}"
    )


def _token_arcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both-orientation distinct adjacency arcs between tokens."""
    docs = parallelize_if_narrow(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    # pair each token with its successor ARRAY-LOCALLY: adjacency is a
    # within-row property, so the old posexplode -> per-doc window ->
    # lead chain shuffled + sorted the whole token stream for nothing
    # (r11 opt; the filtered array preserves order, so index-adjacency
    # equals the old position adjacency and the bigram set is identical)
    pair_arr = F.expr(
        "CASE WHEN size(__toks) >= 2 THEN transform("
        "sequence(0, size(__toks) - 2),"
        " i -> struct(__toks[i] AS t, __toks[i+1] AS t2)) "
        "ELSE cast(array() as array<struct<t:string,t2:string>>) END"
    )
    bigram = (
        docs.select(
            F.filter(F.split("text", "[^a-zA-Z]"), lambda x: x != "").alias(
                "__toks"
            )
        )
        .select(F.explode(pair_arr).alias("p"))
        .filter(F.col("p.t") != F.col("p.t2"))
        .select(
            F.least("p.t", "p.t2").alias("src"),
            F.greatest("p.t", "p.t2").alias("dst"),
        )
        .distinct()
    )
    return bigram.select("src", "dst").unionAll(
        bigram.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


@register("textrank_keywords", oracle=_pagerank_oracle())
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank: top-20 keywords by 5-iteration integer PageRank over
    the token adjacency graph (damping 0.85, rank scale 1e9).

    The wordcount oracle gap the lead()-pairing closes: DuckDB pairs
    positions via an equi-join on pos+1; Spark uses a per-doc window —
    identical bigram sets, no quadratic anything. Ranks table persists
    + localCheckpoints each round (NOTES rule 12); the final top-k is
    a TakeOrderedAndProject with the token tiebreak (NOTES rule 5).
    """
    arcs = stage_cache(_token_arcs(spark, sf_dir))
    deg = stage_cache(arcs.groupBy("src").agg(F.count("*").alias("outdeg")))
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(SCALE).cast("long").alias("rank")
    )
    for _ in range(_ITER):
        # join the two VOCAB-sized frames first (rank div outdeg per
        # node is a node property), so the edge stream pays ONE probe
        # per iteration instead of two arc-sized probes (r11 opt:
        # arcs x ranks then x deg streamed the arc table through two
        # joins; same integer contributions, same bits)
        rd = (
            ranks.join(deg, ranks["node"] == deg["src"])
            .select(ranks["node"], F.expr("rank div outdeg").alias("c"))
        )
        contrib = (
            arcs.join(rd, arcs["src"] == rd["node"]).select("dst", "c")
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                (
                    F.lit(15 * SCALE // 100).cast("long")
                    + F.expr("(85 * s) div 100")
                ).cast("long").alias("rank"),
            )
        )
        ranks = stage_checkpoint(ranks, eager=False)
    return (
        ranks.select(F.col("node").alias("token"), "rank")
        .orderBy(F.col("rank").desc(), "token")
        .limit(_TOPK)
    )


@register(
    "triangle_count",
    oracle="WITH "
    + _TOK_CTE.strip()
    + """,
tri AS (
  SELECT 1 AS one
  FROM edges e1
  JOIN edges e2 ON e2.src = e1.dst
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
SELECT COUNT(*) AS n_triangles FROM tri
""",
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count triangles in the token adjacency graph.

    Oriented-edge formulation: with every edge stored src < dst, a
    triangle a<b<c appears exactly once as (a,b)+(b,c)+(a,c) — two
    joins, no /6 correction, no duplicate explosion. At power-law
    scale the standard refinement (order endpoints by degree before
    orienting, so hubs get low out-degree) bounds the wedge join;
    documented here, unnecessary on a vocabulary graph.
    """
    arcs = _token_arcs(spark, sf_dir)
    edges = stage_cache(arcs.filter(F.col("src") < F.col("dst")))
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    wedges = e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
    tri = wedges.join(
        e3,
        (F.col("e3.src") == F.col("e1.src")) & (F.col("e3.dst") == F.col("e2.dst")),
    )
    return tri.agg(F.count("*").alias("n_triangles"))
