"""Graph analytics over data-derived graphs: weighted PageRank.

The KG-construction complement to the min-label connected components
in ``engine.py`` (which powers alias canonicalization): once a corpus
is lifted into a graph — token adjacencies, entity co-occurrences,
host link graphs — the next question is node IMPORTANCE, and PageRank
(Page et al. 1999) is the standard answer (e.g. Common-Crawl-scale
host ranking, TextRank-style keyword extraction).

Design (Spark-first, oracle-exact):

* Every step is a join + aggregate on the edge list — no windows, no
  driver-side loops over collected data; a fixed ``iters`` (the
  published power-iteration form with a damping factor) keeps the
  computation a finite declarative DAG that Catalyst/AQE optimize
  end-to-end, and makes the result a deterministic function of
  (edges, damping, iters) that a SQL oracle can replay.
* Cross-engine determinism: per-edge contributions are computed with
  ONE fixed IEEE expression shape (``rank * weight / out_weight``,
  left-associative doubles — identical bit patterns in Spark and
  DuckDB), then summed as ``DECIMAL(38,18)`` so the shuffle's
  summation ORDER cannot perturb the result (the same trick as
  ``perplexity``'s DECIMAL log-prob sums). Final ranks are rounded to
  6 dp — the repo-wide oracle contract precision.
* Scale shape: the edge list is the big side and is never collected;
  each iteration shuffles by ``src``/``dst`` like any groupBy join —
  hub skew is AQE's bread and butter because these are joins, not
  windows. Rank state is O(nodes) per iteration. The edge aggregate
  is lazily localCheckpoint'ed before the loop (every iteration
  references it, and each reference would otherwise carry its own
  copy of the token-explode build into the final plan); the rank
  lineage itself grows linearly in ``iters`` — for long loops or
  fault tolerance on a real cluster, interpose durable checkpoints
  every few iterations exactly as ``connected_components`` does.

Simplification (documented, standard in many large-scale
implementations): dangling nodes (no out-edges) do not redistribute
their mass, so ranks sum to slightly less than 1; ranks remain a
valid importance ORDER. Redistribute by adding a uniform
dangling-mass term per iteration if calibrated probabilities are
needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lexmapr_spark.ops.dedup import tokens_col


def token_adjacency_edges(docs: DataFrame,
                          text_col: str = "text") -> DataFrame:
    """Corpus-wide token-adjacency graph: ``(src, dst, weight)`` where
    ``weight`` counts how often token ``dst`` immediately follows
    ``src`` anywhere in the corpus (the TextRank / co-occurrence
    graph, directed, window = 1).

    Pure JVM expressions: per-document bigram structs explode and a
    map-side-combined count collapses repeats before the one shuffle.
    Self-loops (a token repeated back-to-back) are kept — they are
    real adjacencies and PageRank handles them like any edge.
    """
    toks = tokens_col(F.col(text_col))
    # shifted-slice zip, NOT per-index try_element_at (r9, same fix as
    # dedup._shingles_from_tokens): element_at lambdas re-evaluated the
    # inline tokens_col expression per ELEMENT — O(tokens^2) splits per
    # row, the dominant cost of the whole pagerank query at bench
    # scale. Zip pads the last pair's dst with NULL; the filter drops
    # it exactly like the old dst-IsNotNull filter.
    n = F.greatest(F.size(toks) - 1, F.lit(1))
    pairs = F.filter(
        F.arrays_zip(F.slice(toks, 1, n), F.slice(toks, 2, n)),
        lambda s: s["1"].isNotNull())
    return (docs.select(F.explode(pairs).alias("p"))
            .select(F.col("p").getField("0").alias("src"),
                    F.col("p").getField("1").alias("dst"))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("weight")))


def pagerank(edges: DataFrame, damping: float = 0.85,
             iters: int = 5, state: str = "auto",
             state_broadcast_max: int = 2_000_000) -> DataFrame:
    """Weighted PageRank power iteration, fixed ``iters`` rounds:
    ``(node, rank)`` with ``rank`` rounded to 6 dp.

    ``rank_{k+1}(v) = (1-d)/N + d * sum_{(u,v,w) in E}
    rank_k(u) * w / out_weight(u)`` — the damped random surfer over
    weighted edges. ``N`` counts all distinct nodes (union of both
    endpoints); nodes with no in-edges hold the teleport floor
    ``(1-d)/N``.

    Join strategy (guide §3.1, r9): the rank/out-weight state is
    O(nodes) while the edge list is the big side. When the node count
    is bounded (``state="broadcast"``, or ``"auto"`` with a bounded
    ``limit(max+1).count()`` probe — token/keyword graphs have a
    vocabulary-sized state), each iteration BROADCASTS the state into
    the edge scan instead of shuffling the edge list by ``src`` — the
    per-iteration cost drops from two sort-merge exchanges of the
    edges to one small aggregate exchange of per-``dst`` partial sums
    (map-side combined, bounded by nodes x partitions). For graphs
    whose state exceeds ``state_broadcast_max`` (host-level link
    graphs), ``"shuffle"`` keeps the original sort-merge form which
    spills gracefully. ``"auto"`` makes the probe EAGER (one bounded
    job at construction, same precedent as range_join's auto bucket
    derivation); pass an explicit state to stay fully lazy.

    Plan growth (r8 verdict item 3): the rank lineage is truncated
    with a lazy localCheckpoint every iteration, so the final plan is
    O(1) operators per iteration instead of nesting every prior
    round's joins (249 plan nodes at iters=5 before; the checkpoint
    blocks also make round k+1 read round k's materialized state
    instead of re-deriving it through ReuseExchange luck).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if state not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"pagerank: unknown state mode {state!r} "
                         "(expected 'auto', 'broadcast' or 'shuffle')")
    d = float(damping)

    # lineage truncation (same precedent as connected_components'
    # symmetric edge set): every iteration references edges/nodes/
    # out_w, so without a checkpoint the token-explode aggregate
    # rides into the final plan once PER REFERENCE and only
    # ReuseExchange stands between that and re-execution. Lazy local
    # checkpoint: no driver action here — the first job materializes
    # the edge partitions once and later references read the stored
    # blocks.
    edges = edges.select("src", "dst", "weight").localCheckpoint(eager=False)
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct()).localCheckpoint(eager=False)
    if state == "auto":
        # bounded probe: scans at most max+1 node rows, and doubles as
        # the materialization of the edge/node checkpoints the loop
        # reads anyway
        small = nodes.limit(state_broadcast_max + 1).count() \
            <= state_broadcast_max
    else:
        small = state == "broadcast"

    def _state(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    # O(1)-row frames ride along as broadcast cross joins — no driver
    # action, the whole loop stays one lazy DAG
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    out_w = (edges.groupBy("src")
             .agg(F.sum("weight").alias("out_weight"))
             .localCheckpoint(eager=False))

    ranks = (nodes.crossJoin(F.broadcast(n_nodes))
             .select("node",
                     (F.lit(1.0) / F.col("n_nodes")).alias("rank")))
    for _ in range(iters):
        r = _state(ranks).withColumnRenamed("node", "_r_node")
        contrib = (
            edges.join(r, edges.src == r._r_node)
            .join(_state(out_w), "src")
            .groupBy("dst")
            # ONE fixed IEEE shape ((rank * w) / out_w), summed as
            # exact DECIMAL so shuffle order can't perturb the value
            .agg(F.sum((F.col("rank") * F.col("weight")
                        / F.col("out_weight"))
                       .cast("decimal(38,18)")).alias("contrib")))
        ranks = (
            nodes.join(_state(contrib), nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                ((F.lit(1.0) - F.lit(d)) / F.col("n_nodes")
                 + F.lit(d) * F.coalesce(F.col("contrib"), F.lit(0))
                   .cast("double")).alias("rank"))
        ).localCheckpoint(eager=False)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def pagerank_topk(docs: DataFrame, k: int = 100, damping: float = 0.85,
                  iters: int = 5, text_col: str = "text") -> DataFrame:
    """Top-``k`` tokens of the corpus adjacency graph by PageRank —
    TextRank-style corpus keyword extraction as one declarative plan.
    Ordered by (rank desc, node asc); ties deterministic because the
    sort key is the 6-dp ROUNDED rank both engines agree on.

    ``state="broadcast"`` is safe by construction here: the node set
    is the corpus token VOCABULARY (bounded — it grows with the
    language, not the corpus), so the rank state always fits a
    broadcast and the probe job of ``"auto"`` would be wasted work.
    """
    ranks = pagerank(token_adjacency_edges(docs, text_col=text_col),
                     damping=damping, iters=iters, state="broadcast")
    return ranks.orderBy(F.desc("rank"), F.asc("node")).limit(k)
