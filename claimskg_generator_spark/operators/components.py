"""Distributed connected components (alternating large-star / small-star).

The near-dup operators (dedup.py MinHash/SimHash/n-gram, similarity.py
cosine LSH) emit PAIRS; turning pairs into dedup GROUPS — "keep one
representative per duplicate cluster", the step every training-data
pipeline runs after candidate verification — is a connected-components
problem.  The reference has no analog (its reconciler emits owl:sameAs
pairs and stops, reconciler/__init__.py:126-147); this operator closes
that gap Spark-first.

Algorithm: alternating large-star / small-star from the published
MapReduce connected-components literature (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — O(log^2 n) rounds on any
graph, each round two groupBy+join passes over the edge set:

- large-star(u): every neighbor v > u re-attaches to m = min(N(u) + {u})
- small-star(u): every neighbor v <= u re-attaches to m = min(N-(u) + {u})

Both steps strictly never increase the component-internal edge span and
converge to star graphs whose centers are the component minima.  Unlike
naive min-label propagation (rounds = graph diameter — a 10^6-long chain
of near-dup docs needs 10^6 rounds), star rounds collapse chains
logarithmically.

Scale posture:
- No collect_list: each star is groupBy(min) + a same-key join, so a hub
  node (a template document duplicated 10^8 times) never materializes
  its neighborhood in one task; AQE handles the skewed join.
- Lineage is truncated every round (localCheckpoint) — iterative plans
  otherwise grow exponentially in the optimizer.  For production
  cluster runs, set a reliable checkpoint dir and swap to checkpoint().
- Convergence test is a one-pass (count, xxhash64-xor) signature of the
  canonicalized edge set — no exceptAll anti-join per round.
"""

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


class ComponentsDidNotConverge(RuntimeError):
    pass


def _sym(edges: DataFrame) -> DataFrame:
    """Symmetrize and drop self loops; columns (u, v)."""
    return (
        edges.select("u", "v")
        .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(sym: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, m = min(N(u) + {u}).
    ``sym`` must be symmetrized and self-loop-free (see _sym)."""
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("u", "mv").alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(directed: DataFrame) -> DataFrame:
    """Every smaller neighbor (and u itself) re-attaches to the minimum
    of u's smaller-neighbor set.  ``directed`` must already be oriented
    large->small, self-loop-free, and distinct (see _star_round)."""
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    re_lo = (
        directed.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    re_hi = mins.select(F.col("u"), F.col("m").alias("v"))
    return re_lo.union(re_hi).where(F.col("u") != F.col("v")).distinct()


def _star_round(e: DataFrame) -> Tuple[DataFrame, List[DataFrame]]:
    """One large-star + small-star pass.  The symmetrized and oriented
    edge frames each feed TWO consumers (the min aggregation and the
    re-attach join); without persistence each consumer recomputes the
    frame's distinct shuffle — at scale that doubles the heaviest
    exchange of every round.  Returns (result, frames to unpersist once
    the result is materialized)."""
    sym = _sym(e).persist(StorageLevel.MEMORY_AND_DISK)
    ls = _large_star(sym)
    directed = (
        ls.select(F.greatest("u", "v").alias("u"),
                  F.least("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return _small_star(directed), [sym, directed]


def _signature(edges: DataFrame) -> Tuple[int, int]:
    """(count, hash-sum) of the canonicalized edge set — a one-pass
    convergence probe.  A hash-sum collision on UNEQUAL consecutive edge
    sets would stop one round early; with xxhash64 over the canonical
    pairs that is a ~2^-64 event per round, and the result would still be
    a valid partial contraction caught by the verify tests."""
    row = (
        edges.select(F.greatest("u", "v").alias("a"),
                     F.least("u", "v").alias("b"))
        .distinct()
        .agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-independent and overflow-free under ANSI
            # mode (a sum of hashes overflows long); the edge set is
            # distinct'd, so XOR cancellation of repeated rows cannot
            # occur
            F.coalesce(
                F.bit_xor(F.xxhash64(F.col("a").cast("string"),
                                     F.col("b").cast("string"))),
                F.lit(0),
            ).alias("h"),
        )
        .collect()[0]
    )
    return int(row["n"]), int(row["h"])


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 50,
                         truncate_lineage: bool = True) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id of the connected component.

    ``edges`` is undirected input; node ids may be any orderable type
    (long, string).  Singleton nodes never appear in an edge list —
    union them in afterwards if the caller tracks a node universe.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.where(F.col("u") != F.col("v"))
    if truncate_lineage:
        e = e.localCheckpoint(eager=True)
    prev: Optional[Tuple[int, int]] = None
    for _ in range(max_iter):
        e, scratch = _star_round(e)
        if truncate_lineage:
            # LAZY checkpoint: the convergence probe right below is the
            # round's action anyway, and it materializes the checkpoint as
            # a side effect — one job per round instead of two (the eager
            # form paid a separate materialization job before the probe).
            e = e.localCheckpoint(eager=False)
        sig = _signature(e)
        for frame in scratch:
            # the round's result is materialized (checkpoint or signature
            # action) — the per-round caches are dead weight now
            frame.unpersist()
        if sig == prev:
            break
        prev = sig
    else:
        raise ComponentsDidNotConverge(
            f"no convergence in {max_iter} star rounds")
    # converged edge set is a star forest: (node -> root); add the roots
    members = e.select(F.greatest("u", "v").alias("node"),
                       F.least("u", "v").alias("component"))
    roots = members.select(
        F.col("component").alias("node"), F.col("component")
    ).distinct()
    return members.union(roots).distinct()


def dedup_groups(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                 max_iter: int = 50) -> DataFrame:
    """Duplicate-pair resolution: (id, canonical_id) with canonical_id =
    the minimum id of the duplicate cluster.  Feed it the accepted pairs
    of any near-dup operator; rows with id == canonical_id are the
    representatives to KEEP."""
    comp = connected_components(pairs, src=id_a, dst=id_b, max_iter=max_iter)
    return comp.select(F.col("node").alias("id"),
                       F.col("component").alias("canonical_id"))


def dedup_corpus(documents: DataFrame, pairs: DataFrame,
                 id_col: str = "doc_id", id_a: str = "id_a",
                 id_b: str = "id_b", max_iter: int = 50) -> DataFrame:
    """The end of the dedup pipeline: materialize the SURVIVOR corpus.

    ``pairs`` is the accepted pair stream of any near-dup operator (exact,
    MinHash-LSH, SimHash, n-gram Jaccard, embedding LSH); clusters resolve
    via dedup_groups and every non-representative member (id !=
    canonical_id) is dropped from ``documents`` with a left-anti join.

    Scale posture: the loser frame holds only duplicate members — tiny
    next to the corpus at real duplication rates — and its size is only
    known at runtime (iterative components output), so the broadcast
    decision is deliberately left to AQE: the executed plan is a
    BroadcastHashJoin LeftAnti (verified, docs/PLANS.md) and the corpus
    never shuffles; at pathological duplication rates AQE correctly falls
    back to a shuffled anti-join on the id key instead of OOMing a forced
    broadcast hint."""
    losers = (
        dedup_groups(pairs, id_a, id_b, max_iter)
        .filter(F.col("id") != F.col("canonical_id"))
        .select(F.col("id").alias(id_col))
    )
    return documents.join(losers, id_col, "left_anti")


def canonicalize_sameas(triples: DataFrame,
                        max_iter: int = 50) -> DataFrame:
    """Rewrite the graph's pairwise ``owl:sameAs`` edges into star form:
    every member of an equivalence class points at the class's canonical
    representative (its minimum URI), and transitive chains collapse.

    The reference emits raw pairwise sameAs edges (its reconciler output,
    reconciler/__init__.py:126-147) and leaves closure to a downstream OWL
    reasoner; consumers without one (SPARQL-over-parquet, plain joins)
    need the materialized canonical mapping.  Semantically equivalent
    under owl:sameAs symmetry+transitivity; edge count never increases
    (a star is the minimum spanning form of a clique's closure)."""
    from claimskg_generator_spark.constants.namespaces import NS

    is_same = F.col("pred") == NS.OWL_SAME_AS
    rest = triples.where(~is_same)
    edges = triples.where(is_same).select("subj", "obj")
    star = (
        connected_components(edges, src="subj", dst="obj",
                             max_iter=max_iter)
        .where(F.col("node") != F.col("component"))
        .select(
            F.col("node").alias("subj"),
            F.lit(NS.OWL_SAME_AS).alias("pred"),
            F.col("component").alias("obj"),
            F.lit("uri").alias("okind"),
        )
    )
    return rest.unionByName(star)


def smush_sameas(triples: DataFrame, max_iter: int = 50,
                 broadcast_mapping: bool = True,
                 keep_links: bool = True) -> DataFrame:
    """Full identity resolution ("smushing"): resolve the graph's
    ``owl:sameAs`` equivalence classes and REWRITE every triple's
    subject and URI object onto the class representative (the minimum
    URI), so all facts asserted about any alias land on ONE canonical
    node.  :func:`canonicalize_sameas` only normalizes the sameAs
    edges themselves (star form); this rewrites the whole graph
    through the mapping — the operator a consumer needs when duplicate
    entities (reconciler output, IFP entailment — rdfs.ifp_sameas)
    should disappear from query results, not merely be linked.

    ``keep_links=True`` retains the provenance star (alias ->
    representative) in the output so original URIs stay resolvable;
    ``False`` drops the aliases entirely.  Literal objects (``okind``
    != 'uri', when the column is present) are never rewritten.
    Idempotent: smushing a smushed graph is a no-op (the provenance
    star maps aliases to an already-canonical representative, and
    rewritten facts only mention representatives).

    Scale shape: the class mapping is proportional to the number of
    DUPLICATE entities — orders of magnitude smaller than the graph —
    so it broadcasts (``broadcast_mapping=True``; pass False to let
    AQE pick a shuffled join for pathological duplication rates) and
    the 100 TB triple frame is touched by two broadcast left joins +
    the one set-dedup exchange.  Class resolution itself is
    :func:`connected_components` over the sameAs sliver only
    (O(log^2 n) rounds on the duplicate subgraph, bounded lineage)."""
    from claimskg_generator_spark.constants.namespaces import NS

    is_same = F.col("pred") == NS.OWL_SAME_AS
    rest = triples.where(~is_same)
    edges = triples.where(is_same).select("subj", "obj")
    mapping = (
        connected_components(edges, src="subj", dst="obj",
                             max_iter=max_iter)
        .where(F.col("node") != F.col("component"))
    )
    m = F.broadcast(mapping) if broadcast_mapping else mapping
    ms = m.select(F.col("node").alias("__sn"),
                  F.col("component").alias("__sr"))
    mo = m.select(F.col("node").alias("__on"),
                  F.col("component").alias("__or"))
    has_okind = "okind" in triples.columns
    obj_cond = F.col("obj") == F.col("__on")
    if has_okind:
        obj_cond = obj_cond & (F.col("okind") == F.lit("uri"))
    out_cols = [
        F.coalesce("__sr", "subj").alias("subj") if c == "subj"
        else F.coalesce("__or", "obj").alias("obj") if c == "obj"
        else F.col(c)
        for c in triples.columns
    ]
    out = (
        rest.join(ms, F.col("subj") == F.col("__sn"), "left")
        .join(mo, obj_cond, "left")
        .select(*out_cols)
        .distinct()
    )
    if keep_links:
        star_cols = [
            F.col("node").alias("subj") if c == "subj"
            else F.lit(NS.OWL_SAME_AS).alias("pred") if c == "pred"
            else F.col("component").alias("obj") if c == "obj"
            else F.lit("uri").alias("okind") if c == "okind"
            else F.lit(None).cast(triples.schema[c].dataType).alias(c)
            for c in triples.columns
        ]
        out = out.unionByName(mapping.select(*star_cols))
    return out


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 8,
    tol: Optional[float] = None,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge list (each edge
    contributes both directions).  r_{k+1}(v) = (1-d)/N + d * sum over
    in-neighbors u of r_k(u)/outdeg(u).

    Iterative DataFrame loop: each iteration is one co-partitioned join
    (ranks x out-edges on the source) + one groupBy(dst) sum — the
    standard distributed power-iteration shape.  Degrees and the
    symmetric edge list are computed once and persisted (they are
    re-read every iteration); the rank frame stays (node, rank) slim.
    Fixed n_iters keeps the result deterministic and oracle-checkable
    (an unrolled SQL twin).

    ``checkpoint_every``: localCheckpoint the rank frame every that many
    iterations (same truncation connected_components applies per round) —
    without it the logical plan grows linearly in n_iters and a
    30-iteration run pays multi-megabyte optimizer passes per action.
    Values and the per-iteration shuffle profile are unchanged; pinned by
    tests/test_components.py::test_pagerank_deep_iteration_plan_bounded.

    ``tol``: optional convergence stop (the production variant) — after
    each iteration the max |r_{k+1} - r_k| over nodes is checked (one
    small action per iteration, piggybacking the same slim rank frames)
    and the loop exits early once it drops below ``tol``.  n_iters then
    acts as the iteration CAP.  Leave None (default) for the fixed-
    iteration oracle-deterministic behavior.
    """
    if n_iters < 0:
        raise ValueError("n_iters must be >= 0")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    sym = e.unionByName(
        e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    deg = sym.groupBy("s").agg(F.count("*").alias("od"))
    out_edges = sym.join(deg, "s").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = sym.select(F.col("s").alias("node")).distinct()
    n_nodes = nodes.count()  # one intentional action: sizes the teleport term
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    teleport = (1.0 - damping) / n_nodes
    for i in range(n_iters):
        prev_ranks = ranks
        contrib = (
            out_edges.join(ranks, out_edges["s"] == ranks["node"])
            .select(
                F.col("t").alias("node"),
                (F.col("rank") / F.col("od")).alias("c"),
            )
        )
        ranks = (
            contrib.groupBy("node")
            .agg((F.lit(teleport) + damping * F.sum("c")).alias("rank"))
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iters:
            ranks = ranks.localCheckpoint(eager=True)
        if tol is not None:
            delta = (
                ranks.join(
                    prev_ranks.select("node",
                                      F.col("rank").alias("prev_rank")),
                    "node", "left")
                .agg(F.max(F.abs(
                    F.col("rank") - F.coalesce("prev_rank", F.lit(0.0))
                )).alias("d"))
                .collect()[0]["d"]
            )
            if delta is not None and delta < tol:
                break
    out = nodes.join(ranks, "node", "left").select(
        "node",
        F.round(F.coalesce("rank", F.lit(teleport)), 6).alias("rank"),
    )
    return out


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iters: int = 2,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Synchronous label propagation (community detection) over an
    undirected edge list.  Each iteration every node adopts the most
    frequent label among its neighbors, ties broken to the
    lexicographically smallest label — which makes the fixed-iteration
    result fully deterministic (classic async LPA is order-dependent;
    the synchronous min-tie-break variant is the reproducible twin).

    Per iteration: one co-partitioned labels x edges join, a
    (node, label) count aggregate, and a row_number window for the
    argmax — all keyed on the node, the same shuffle profile as one
    PageRank step.  ``checkpoint_every`` truncates the label frame's
    lineage every that many iterations, exactly as in pagerank — deep
    runs keep a bounded plan, values unchanged.
    """
    if n_iters < 0:
        raise ValueError("n_iters must be >= 0")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    sym = e.unionByName(
        e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    labels = sym.select(F.col("s").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    from pyspark.sql import Window

    for i in range(n_iters):
        neigh = (
            sym.join(labels, sym["s"] == labels["node"])
            .select(F.col("t").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count("*").alias("c"))
        )
        w = Window.partitionBy("node").orderBy(
            F.desc("c"), F.asc("label")
        )
        labels = (
            neigh.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iters:
            labels = labels.localCheckpoint(eager=True)
    return labels


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst", persist: bool = True) -> DataFrame:
    """Per-vertex triangle counting with degree-ordered orientation —
    the clustering-coefficient / community-density primitive of the
    graph family (components, PageRank, LPA all live in this module).

    Algorithm (Cohen, "Graph Twiddling in a MapReduce World", CiSE 2009
    / the compact-forward ordering of Latapy 2008): canonicalize to an
    undirected simple graph, orient every edge from the (degree, id)-
    LOWER endpoint to the higher, enumerate wedges by joining oriented
    edges on their shared tail, and confirm each wedge against the
    oriented closing edge.  Orientation bounds every vertex's
    out-degree by O(sqrt(m)), so the wedge set — the only
    super-linear intermediate — is O(m^1.5) worst case instead of the
    O(Σ deg(v)^2) a hub vertex costs without it; each triangle is
    produced exactly once (its vertices appear in orientation order).

    Scale posture (100 TB edge set): three equi-join shuffles (two
    degree attachments, one wedge closure) + two groupBys — no
    collect_list neighborhood materialization, so a 10^8-degree hub
    never lands in one task; the skewed wedge join is AQE skew-split
    territory.  ``persist`` (default True) materializes the oriented
    edge frame once — it is consumed three times (both wedge sides and
    the closure probe).

    Output, one row per vertex: ``vertex``, ``degree`` (undirected,
    deduped), ``n_triangles`` (triangles the vertex participates in;
    0 for triangle-free vertices).  All integers — hash-exact across
    engines.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        und.join(deg.select(F.col("v").alias("a"),
                            F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"),
                         F.col("deg").alias("db")), "b")
    )
    a_lower = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    fwd = e.select(
        F.when(a_lower, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_lower, F.col("b")).otherwise(F.col("a")).alias("w"),
        F.when(a_lower, F.col("db")).otherwise(F.col("da")).alias("dw"),
    )
    if persist:
        fwd = fwd.persist(StorageLevel.MEMORY_AND_DISK)
    f1 = fwd.select("u", F.col("w").alias("w1"), F.col("dw").alias("dw1"))
    f2 = fwd.select("u", F.col("w").alias("w2"), F.col("dw").alias("dw2"))
    # wedge (w1, w2) kept in orientation order so the closing edge, if
    # present, is oriented w1 -> w2 and one equi-join confirms it
    wedge = f1.join(f2, "u").filter(
        (F.col("dw1") < F.col("dw2"))
        | ((F.col("dw1") == F.col("dw2")) & (F.col("w1") < F.col("w2")))
    )
    tri = wedge.join(
        fwd.select(F.col("u").alias("w1"), F.col("w").alias("w2")),
        ["w1", "w2"],
    ).select("u", "w1", "w2")
    tc = (
        tri.select(F.explode(F.array("u", "w1", "w2")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        deg.join(tc, "v", "left")
        .select(
            F.col("v").alias("vertex"),
            F.col("deg").alias("degree"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_triangles"),
        )
    )


def kcore_peel(edges: DataFrame, k: int, n_rounds: Optional[int] = None,
               max_rounds: int = 50, src: str = "src", dst: str = "dst",
               checkpoint_every: int = 5) -> DataFrame:
    """Iterative k-core peel: repeatedly drop nodes whose degree over
    the SURVIVING edge set is below ``k`` (and the edges touching
    them), then return per-node degrees of what remains — the standard
    density filter before community/clustering passes, and the dual of
    triangle counting for "is this neighborhood real or noise".

    ``n_rounds`` fixed pins the round count (the q55 pagerank
    fixed-iteration pattern — unrollable by a SQL twin); ``n_rounds=
    None`` peels to the true k-core, probing convergence with ONE
    tiny-row count per round (the connected_components probe shape)
    and giving up loudly after ``max_rounds``.

    Scale shape: each round is a map-side-combinable degree groupBy
    plus two anti joins keyed on the node id — no all-pairs, no
    collect of the node set; lineage is truncated every
    ``checkpoint_every`` rounds (localCheckpoint) exactly like
    connected_components, so deep peels keep a bounded plan.

    Output: ``node``, ``degree`` (degree within the peeled core).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_rounds is not None and n_rounds < 0:
        raise ValueError(f"n_rounds must be >= 0, got {n_rounds}")

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rounds = n_rounds if n_rounds is not None else max_rounds
    cached = []

    def _degrees(frame: DataFrame) -> DataFrame:
        return (
            frame.select(F.col("u").alias("node"))
            .unionAll(frame.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )

    converged = n_rounds is not None
    for r in range(rounds):
        bad = _degrees(e).filter(F.col("degree") < k).select("node")
        if n_rounds is None:
            bad = bad.persist(StorageLevel.MEMORY_AND_DISK)
            cached.append(bad)
            if bad.isEmpty():
                converged = True
                break
        e = (
            e.join(bad.withColumnRenamed("node", "u"), "u", "left_anti")
            .join(bad.withColumnRenamed("node", "v"), "v", "left_anti")
            .select("u", "v")
        )
        if (r + 1) % checkpoint_every == 0:
            e = e.localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    if not converged:
        raise RuntimeError(
            f"kcore_peel(k={k}) did not converge in {max_rounds} rounds"
        )
    return _degrees(e)


def bfs_layers(edges: DataFrame, sources: DataFrame,
               n_rounds: Optional[int] = None, max_rounds: int = 50,
               src: str = "src", dst: str = "dst",
               directed: bool = False,
               checkpoint_every: int = 5) -> DataFrame:
    """Multi-source BFS: shortest hop distance from any source node —
    the reachability/radius primitive the graph family was missing
    (seed-set expansion, contamination blast radius around a known-bad
    document cluster, "within k hops of a curated node").

    ``sources``: a one-column DataFrame (``node``) of start nodes; they
    report dist 0 even when isolated.  ``n_rounds`` fixed pins the
    depth (the q55/q77 fixed-iteration pattern — replayable by a
    bounded recursive-CTE SQL twin); ``n_rounds=None`` expands until
    the frontier empties, probing with ONE tiny isEmpty per round and
    giving up loudly after ``max_rounds``.

    Scale shape: each round is one frontier ⋈ edges equi-join + a
    distinct + an anti join against the visited set — all keyed on the
    node id, never all-pairs; the visited/frontier frames persist and
    lineage truncates every ``checkpoint_every`` rounds exactly like
    connected_components, so deep walks keep a bounded plan.  Output:
    ``node``, ``dist``.
    """
    if n_rounds is not None and n_rounds < 0:
        raise ValueError(f"n_rounds must be >= 0, got {n_rounds}")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not directed:
        e = e.unionAll(e.select(F.col("v").alias("u"),
                                F.col("u").alias("v")))
    e = e.persist(StorageLevel.MEMORY_AND_DISK)

    visited = (sources.select(F.col(sources.columns[0]).alias("node"))
               .distinct()
               .withColumn("dist", F.lit(0).cast("int"))
               .persist(StorageLevel.MEMORY_AND_DISK))
    frontier = visited
    cached = [e, visited]
    rounds = n_rounds if n_rounds is not None else max_rounds
    converged = n_rounds is not None
    for r in range(1, rounds + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(r).cast("int"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        cached.append(nxt)
        if n_rounds is None and nxt.isEmpty():
            converged = True
            break
        visited = visited.unionAll(nxt)
        frontier = nxt
        if r % checkpoint_every == 0:
            visited = visited.localCheckpoint(eager=True)
            frontier = frontier.localCheckpoint(eager=True)
    out = visited.localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    if not converged:
        raise RuntimeError(
            f"bfs_layers did not drain the frontier in {max_rounds} "
            "rounds; raise max_rounds or pin n_rounds")
    return out


def random_walks(edges: DataFrame, walk_length: int, num_walks: int,
                 seed: str = "walks", src: str = "src",
                 dst: str = "dst",
                 checkpoint_every: int = 8) -> DataFrame:
    """DeepWalk-style random-walk corpus generation (Perozzi et al.,
    KDD 2014) with DETERMINISTIC md5 picks — the graph-to-sequence
    operator that turns a KG into training sentences for skip-gram /
    node-embedding models, the graph analog of the engine's document
    corpus-prep family.

    From every node, ``num_walks`` walks of up to ``walk_length``
    nodes; at each step the next hop is neighbor number
    ``md5(seed:start:walk_idx:step) mod out_degree`` over the
    neighbor list ranked by destination id — so the "randomness" is a
    pure function of (seed, walk identity, step): retry-stable,
    engine-replayable (the md5-hex-to-int discipline of the q81/q127
    oracles), and each walk is independently addressable.  A walk
    that reaches a sink node simply ends (shorter sentence), the
    DeepWalk convention.

    Output: ``(start, walk_idx, walk, n_nodes)`` — ``walk`` the
    space-joined node sentence.

    Scale shape: one ranked-neighbor dim (row_number per source over
    the DISTINCT edge set + out-degrees, persisted once) and
    ``walk_length - 1`` equi-joins keyed on the current node — never
    all-pairs, no driver actions; the walk frame's lineage truncates
    every ``checkpoint_every`` steps like every iterative operator
    here.  State per walk is O(1) columns plus the growing sentence
    string.
    """
    if walk_length < 1:
        raise ValueError(f"walk_length must be >= 1, got {walk_length}")
    if num_walks < 1:
        raise ValueError(f"num_walks must be >= 1, got {num_walks}")
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .distinct())
    from pyspark.sql import Window

    ranked = (e.withColumn(
        "rk", F.row_number().over(
            Window.partitionBy("u").orderBy("v")))
        .withColumn("deg", F.count(F.lit(1)).over(
            Window.partitionBy("u")))
        .persist(StorageLevel.MEMORY_AND_DISK))

    nodes = (e.select(F.col("u").alias("start"))
             .unionAll(e.select(F.col("v").alias("start")))
             .distinct())
    walks = nodes.select(
        "start",
        F.explode(F.sequence(F.lit(0),
                             F.lit(num_walks - 1))).alias("walk_idx"),
    ).select(
        "start", "walk_idx",
        F.col("start").alias("cur"),
        F.col("start").alias("walk"),
        F.lit(1).cast("int").alias("n_nodes"),
        F.lit(False).alias("done"),
    )
    for step in range(1, walk_length):
        # 60-bit positive md5 slice — nonnegative, so % == pmod and
        # the DuckDB twin's % agrees
        h = F.conv(F.substring(F.md5(F.concat_ws(
            ":", F.lit(seed), F.col("start"),
            F.col("walk_idx").cast("string"),
            F.lit(str(step)))), 1, 15), 16, 10).cast("long")
        pick = (h % F.col("deg") + 1).cast("int")
        stepped = (
            walks.join(
                ranked,
                (walks["cur"] == ranked["u"]) & ~walks["done"],
                "left")
            .where(F.col("u").isNull() | (F.col("rk") == pick))
            .select(
                "start", "walk_idx",
                F.coalesce(F.col("v"), F.col("cur")).alias("cur"),
                F.when(F.col("v").isNotNull(),
                       F.concat_ws(" ", "walk", "v"))
                .otherwise(F.col("walk")).alias("walk"),
                (F.col("n_nodes")
                 + F.col("v").isNotNull().cast("int")).alias("n_nodes"),
                (F.col("done") | F.col("v").isNull()).alias("done"),
            ))
        walks = stepped
        if step % checkpoint_every == 0:
            walks = walks.localCheckpoint(eager=False)
    # ranked stays pinned for the job (the bfs_layers/pagerank
    # convention); the session frees it
    return walks.select("start", "walk_idx", "walk", "n_nodes")


def biased_random_walks(edges: DataFrame, walk_length: int,
                        num_walks: int, w_return: int = 1,
                        w_inward: int = 1, w_outward: int = 1,
                        seed: str = "n2v", src: str = "src",
                        dst: str = "dst",
                        checkpoint_every: int = 8) -> DataFrame:
    """node2vec-style SECOND-ORDER biased walks (Grover & Leskovec,
    KDD 2016) with deterministic md5 picks — :func:`random_walks`'
    DeepWalk corpus, upgraded with the return/in-out bias that lets
    the embedding interpolate between BFS-like (structural) and
    DFS-like (homophilous) neighborhoods.

    node2vec weights each candidate next-hop ``x`` from ``cur`` given
    the PREVIOUS node: ``1/p`` if ``x == prev`` (return), ``1`` if
    ``x`` is also a neighbor of ``prev`` (stay close), ``1/q``
    otherwise (move away).  Here the three classes carry INTEGER
    weights (``w_return`` ∝ 1/p, ``w_inward`` ∝ 1, ``w_outward`` ∝
    1/q — scale all three by a common factor to express any rational
    p/q), so the cumulative-weight pick is exact 64-bit arithmetic:
    ``r = md5_60bit(seed:start:walk_idx:step) mod total_weight``
    selects the candidate whose cumulative range covers ``r``.  No
    floats anywhere — the walk is a pure function of the walk
    identity, retry-stable and replayed bit-for-bit by the DuckDB
    oracle (floating cumsums would need a cross-engine summation-order
    contract; integers need nothing).  The FIRST hop is uniform
    (``mod out_degree`` — no prev yet), the node2vec convention.

    Output matches :func:`random_walks`: ``(start, walk_idx, walk,
    n_nodes)``, sink nodes ending walks early.

    Scale shape, per step: ONE equi-join of the walk frame against the
    ranked-neighbor dim on the current node (deg-bounded candidate
    fan-out — never all-pairs), ONE probe equi-join against the same
    persisted edge dim marking the ``prev``-neighbor class, and ONE
    window exchange keyed by the walk id for the cumulative pick —
    walk state is O(1) columns, lineage truncates every
    ``checkpoint_every`` steps.  The second-order bias is why a probe
    join exists at all: "is the candidate a neighbor of where I came
    from" is a data question, not a row-local one (the reference has
    no graph-embedding analog; this serves the KG's training-corpus
    face alongside q128)."""
    if walk_length < 1:
        raise ValueError(f"walk_length must be >= 1, got {walk_length}")
    if num_walks < 1:
        raise ValueError(f"num_walks must be >= 1, got {num_walks}")
    for nm, w in (("w_return", w_return), ("w_inward", w_inward),
                  ("w_outward", w_outward)):
        if not isinstance(w, int) or w < 1:
            raise ValueError(
                f"{nm} must be a positive int, got {w!r} — express "
                "node2vec p/q as integer class weights (w_return ∝ 1/p,"
                " w_inward ∝ 1, w_outward ∝ 1/q, scaled by a common "
                "factor)")
    from pyspark.sql import Window

    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .distinct())
    ranked = (e.withColumn(
        "rk", F.row_number().over(
            Window.partitionBy("u").orderBy("v")))
        .withColumn("deg", F.count(F.lit(1)).over(
            Window.partitionBy("u")))
        .persist(StorageLevel.MEMORY_AND_DISK))

    nodes = (e.select(F.col("u").alias("start"))
             .unionAll(e.select(F.col("v").alias("start")))
             .distinct())
    walks = nodes.select(
        "start",
        F.explode(F.sequence(F.lit(0),
                             F.lit(num_walks - 1))).alias("walk_idx"),
    ).select(
        "start", "walk_idx",
        F.lit(None).cast("string").alias("prev"),
        F.col("start").alias("cur"),
        F.col("start").alias("walk"),
        F.lit(1).cast("int").alias("n_nodes"),
        F.lit(False).alias("done"),
    )
    probe = ranked.select(F.col("u").alias("pu"), F.col("v").alias("pv"))
    wwin = Window.partitionBy("start", "walk_idx")
    for step in range(1, walk_length):
        # the shared 60-bit positive md5 slice (q128's discipline)
        h = F.conv(F.substring(F.md5(F.concat_ws(
            ":", F.lit(seed), F.col("start"),
            F.col("walk_idx").cast("string"),
            F.lit(str(step)))), 1, 15), 16, 10).cast("long")
        cand = walks.join(
            ranked, (walks["cur"] == ranked["u"]) & ~walks["done"],
            "left")
        if step == 1:
            # no prev yet: uniform over the neighbor list
            picked = cand.where(
                F.col("u").isNull()
                | (F.col("rk") == (h % F.col("deg") + 1).cast("int")))
        else:
            cand = cand.join(
                probe,
                (cand["prev"] == probe["pu"]) & (cand["v"] == probe["pv"]),
                "left")
            wt = (F.when(F.col("u").isNull(), F.lit(None))
                  .when(F.col("v") == F.col("prev"), F.lit(w_return))
                  .when(F.col("pu").isNotNull(), F.lit(w_inward))
                  .otherwise(F.lit(w_outward))).cast("long")
            scored = cand.withColumn("wt", wt).select(
                "start", "walk_idx", "prev", "cur", "walk", "n_nodes",
                "done", "u", "v", "wt",
                F.sum("wt").over(wwin.orderBy("rk")).alias("cum"),
                F.sum("wt").over(wwin).alias("tot"),
            )
            r = h % F.col("tot")
            picked = scored.where(
                F.col("u").isNull()
                | ((F.col("cum") - F.col("wt") <= r) & (r < F.col("cum"))))
        stepped = picked.select(
            "start", "walk_idx",
            F.col("cur").alias("prev"),
            F.coalesce(F.col("v"), F.col("cur")).alias("cur"),
            F.when(F.col("v").isNotNull(),
                   F.concat_ws(" ", "walk", "v"))
            .otherwise(F.col("walk")).alias("walk"),
            (F.col("n_nodes")
             + F.col("v").isNotNull().cast("int")).alias("n_nodes"),
            (F.col("done") | F.col("v").isNull()).alias("done"),
        )
        walks = stepped
        if step % checkpoint_every == 0:
            walks = walks.localCheckpoint(eager=False)
    return walks.select("start", "walk_idx", "walk", "n_nodes")


def wl_colors(triples: DataFrame, n_iters: int = 2,
              checkpoint_every: int = 3) -> DataFrame:
    """1-dimensional Weisfeiler-Leman color refinement over a triple
    graph: ``(node, color)`` rows where ``color`` is the node's
    structural-role fingerprint after ``n_iters`` rounds — the
    classic graph-isomorphism refinement (Weisfeiler & Leman 1968;
    the WL-kernel of Shervashidze et al. 2011) as a distributed
    fixed-depth iteration.

    Every node starts with the SAME color (``md5('')`` — pure
    structure, no identity), and each round rehashes a node's color
    together with the SORTED multiset of its incident
    ``direction:predicate:neighbor-color`` messages (both directions,
    predicate-labeled — the RDF form of the WL message).  Two nodes
    share a color after k rounds iff their k-hop neighborhood
    unfoldings agree, so the colors are structural ROLE ids:
    blank-node-safe canonical labels, graph-kernel features, and the
    per-node half of :func:`wl_fingerprint`.  Everything is md5 over
    canonically-ordered strings — engine-replayable (driver q155
    unrolls the rounds as DuckDB CTEs with ordered string_agg).

    Scale shape per round: two co-partitioned equi-joins (edge ⨝
    colors, once per direction) + one groupBy(node) whose state is
    the sorted message list — the PageRank shuffle profile
    (components.pagerank:311); the edge frame persists once; color
    lineage truncates every ``checkpoint_every`` rounds.  Message
    lists are bounded by node degree: for 100 TB graphs cap
    super-hub degree upstream (the q122 hub-overflow discipline) —
    the hash is exact for every node whose messages fit.

    The reference has no analog (its graph lives in rdflib); this is
    part of the KG-publication family (graph diff/versioning:
    triple_diff tells you WHAT changed, wl_fingerprint whether two
    anonymized/relabeled graphs are structurally equal)."""
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    # set semantics: a storage-duplicated triple must not duplicate WL
    # messages, or the "relabeled-but-equal graphs share the hash"
    # contract silently breaks (same discipline as hits_scores)
    e = (triples.select("subj", "pred", "obj").distinct()
         .persist(StorageLevel.MEMORY_AND_DISK))
    nodes = (e.select(F.col("subj").alias("node"))
             .unionAll(e.select(F.col("obj").alias("node")))
             .distinct())
    colors = nodes.withColumn("color", F.md5(F.lit("")))
    for i in range(1, n_iters + 1):
        if i > 1:
            # each round consumes the previous colors from THREE branches
            # (both direction joins + the color-rehash join); without a
            # per-round materialization the previous round's whole chain
            # re-evaluates once per branch — measured 3x round-1 work in
            # round 2 for q155.  localCheckpoint also truncates lineage
            # (the node-sized frame is what pagerank checkpoints too).
            colors = colors.localCheckpoint(eager=True)
        cd = colors.select(F.col("node").alias("__n"),
                           F.col("color").alias("__c"))
        out_msgs = (
            e.join(cd, e["obj"] == cd["__n"])
            .select(F.col("subj").alias("node"),
                    F.concat_ws(":", F.lit("o"), F.col("pred"),
                                F.col("__c")).alias("msg")))
        in_msgs = (
            e.join(cd, e["subj"] == cd["__n"])
            .select(F.col("obj").alias("node"),
                    F.concat_ws(":", F.lit("i"), F.col("pred"),
                                F.col("__c")).alias("msg")))
        msgs = (out_msgs.unionAll(in_msgs)
                .groupBy("node")
                .agg(F.concat_ws(
                    ",", F.sort_array(F.collect_list("msg")))
                    .alias("__m")))
        colors = (colors.join(msgs, "node", "left")
                  .select("node",
                          F.md5(F.concat_ws(
                              "#", F.col("color"),
                              F.coalesce(F.col("__m"), F.lit(""))))
                          .alias("color")))
        if i % checkpoint_every == 0:
            colors = colors.localCheckpoint(eager=True)
    out = colors.localCheckpoint(eager=True)
    e.unpersist()
    return out


def wl_fingerprint(triples: DataFrame, n_iters: int = 2) -> DataFrame:
    """One-row isomorphism-invariant graph fingerprint from
    :func:`wl_colors`: ``(n_nodes, n_roles, xor_h, sum_h)`` — node
    count, distinct WL colors, and the xor / exact-decimal sum of the
    60-bit color hashes.  Equal fingerprints <=> equal WL color
    MULTISETS (up to hash collision), which relabeled-but-isomorphic
    graphs preserve and any structural change breaks.

    The multiset is folded COMMUTATIVELY (xor + sum of per-node
    hashes — the connected_components convergence-probe discipline at
    components.py:104), never a sorted global concat: the fold is
    map-side combinable and mergeable across shards, so the
    fingerprint costs one aggregate over the color frame at any
    scale.  ``sum_h`` is an exact decimal (DuckDB replays it as
    HUGEINT; emitted as a string so both engines compare bytes)."""
    colors = wl_colors(triples, n_iters=n_iters)
    h = F.conv(F.substring(F.col("color"), 1, 15), 16, 10).cast("long")
    return (colors.select(F.col("color"), h.alias("__h"))
            .agg(F.count("*").alias("n_nodes"),
                 F.countDistinct("color").alias("n_roles"),
                 F.bit_xor("__h").alias("xor_h"),
                 F.sum(F.col("__h").cast("decimal(38,0)"))
                 .cast("decimal(38,0)").cast("string").alias("sum_h")))


def shortest_paths(edges: DataFrame, sources: DataFrame,
                   n_rounds: Optional[int] = None, max_rounds: int = 50,
                   src: str = "src", dst: str = "dst",
                   weight: str = "w", directed: bool = True,
                   checkpoint_every: int = 5) -> DataFrame:
    """Multi-source WEIGHTED shortest paths — frontier-only
    Bellman-Ford (semi-naive relaxation): ``(node, dist)`` with the
    minimal path weight from any source, the weighted twin of
    :func:`bfs_layers` (supply-chain latency/cost radius where hop
    count is not the metric).

    Weights must be NON-NEGATIVE INTEGERS (cast to long; exact
    arithmetic — the engine's no-float-accumulation discipline: scale
    rational costs upstream).  Negative weights are a contract
    violation this function does not detect (a fixed-round run still
    returns the exact min over ``<= n_rounds``-edge paths, but
    convergence mode may stop early of the true fixpoint).

    After round k, ``dist`` is EXACTLY ``min`` over paths of
    ``<= k`` edges — so ``n_rounds`` fixed pins the depth (the
    q83/q55 fixed-iteration pattern, replayable by a bounded
    recursive-CTE twin: min over the hop-bounded walk — driver
    q156); ``n_rounds=None`` relaxes until NO distance improves
    (one tiny isEmpty probe per round), giving up loudly after
    ``max_rounds``.

    Scale shape per round: one frontier ⋈ edges equi-join, one
    map-side-combinable groupBy(node) min over the candidate
    relaxations, one left join against the current dist frame to
    keep IMPROVEMENTS only (the semi-naive delta — re-relaxing
    settled nodes is what naive BF wastes), then an anti-join +
    union to fold improvements into dist; frontier = improvements,
    so work is proportional to the wavefront, not the graph.
    Lineage truncates every ``checkpoint_every`` rounds.  Sources
    report dist 0 even when isolated."""
    if n_rounds is not None and n_rounds < 0:
        raise ValueError(f"n_rounds must be >= 0, got {n_rounds}")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"),
                     F.col(weight).cast("long").alias("w"))
    if not directed:
        e = e.unionAll(e.select(F.col("v").alias("u"),
                                F.col("u").alias("v"), F.col("w")))
    e = e.persist(StorageLevel.MEMORY_AND_DISK)

    dist = (sources.select(F.col(sources.columns[0]).alias("node"))
            .distinct()
            .withColumn("dist", F.lit(0).cast("long"))
            .persist(StorageLevel.MEMORY_AND_DISK))
    frontier = dist
    cached = [e, dist]
    rounds = n_rounds if n_rounds is not None else max_rounds
    converged = n_rounds is not None
    for r in range(1, rounds + 1):
        # frontier carries e in its lineage after round 1 — rename its
        # columns and resolve by name so the relaxation join is never
        # an ambiguous self-join
        fr = frontier.select(F.col("node").alias("__fn"),
                             F.col("dist").alias("__fd"))
        cand = (
            fr.join(e, F.col("__fn") == F.col("u"))
            .select(F.col("v").alias("node"),
                    (F.col("__fd") + F.col("w")).alias("d"))
            .groupBy("node").agg(F.min("d").alias("d"))
        )
        improved = (
            cand.join(dist.select(F.col("node"),
                                  F.col("dist").alias("__cur")),
                      "node", "left")
            .where(F.col("__cur").isNull()
                   | (F.col("d") < F.col("__cur")))
            .select("node", F.col("d").alias("dist"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        cached.append(improved)
        if n_rounds is None and improved.isEmpty():
            converged = True
            break
        dist = (dist.join(improved.select("node"), "node", "left_anti")
                .unionByName(improved))
        frontier = improved
        if r % checkpoint_every == 0:
            dist = dist.localCheckpoint(eager=True)
            frontier = frontier.localCheckpoint(eager=True)
    out = dist.localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    if not converged:
        raise RuntimeError(
            f"shortest_paths did not converge in {max_rounds} rounds; "
            "raise max_rounds or pin n_rounds")
    return out


def hits_scores(edges: DataFrame, n_iters: int = 2,
                src: str = "src", dst: str = "dst",
                checkpoint_every: int = 3) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) as a fixed-depth
    EXACT-INTEGER power iteration: ``(node, hub, auth)`` after
    ``n_iters`` rounds from the all-ones start, WITHOUT the usual
    per-round normalization — scores are the raw path-counting
    integers (hub = walks alternating out/in of length 2k+1 from the
    node, auth = the dual), carried as DECIMAL(38,0) so the driver
    oracle replays them bit-for-bit (cross-engine float normalization
    carries no contract; callers normalize/rank downstream — ranking
    is invariant to the scale factor dropped here).  Growth is
    bounded by (max degree)^(2·n_iters): at the default 2 rounds a
    10^9-degree hub still fits decimal(38); deeper runs are the
    caller's overflow responsibility (documented, like pagerank's
    n_iters lineage note).  ADVICE r5 asymmetry note: under non-ANSI
    Spark a decimal(38) overflow yields NULL and the final coalesce
    would report that node's hub/auth as "0" (silent), while the
    DuckDB oracle's HUGEINT errors loudly — for deep ``n_iters`` runs
    enable ``spark.sql.ansi.enabled`` so overflow raises instead, or
    treat any 0 score on a connected node as suspect.

    Round shape (the pagerank profile): auth = one
    map-side-combinable groupBy(dst) sum over the edge frame joined
    with current hubs; hub = the dual groupBy(src) over the new
    auths; edges persist once; lineage truncates every
    ``checkpoint_every`` rounds.  Nodes with no incoming edges keep
    auth 0, no outgoing keep hub 0 (coalesced — every node reports)."""
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    dec = "decimal(38,0)"
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .distinct()
         .persist(StorageLevel.MEMORY_AND_DISK))
    nodes = (e.select(F.col("u").alias("node"))
             .unionAll(e.select(F.col("v").alias("node")))
             .distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))
    hub = nodes.withColumn("hub", F.lit(1).cast(dec))
    cached = [e, nodes]
    for i in range(1, n_iters + 1):
        h = hub.select(F.col("node").alias("__hn"),
                       F.col("hub").alias("__h"))
        auth = (
            e.join(h, e["u"] == F.col("__hn"))
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("__h").cast(dec).alias("auth")))
        a = auth.select(F.col("node").alias("__an"),
                        F.col("auth").alias("__a"))
        hub = (
            e.join(a, e["v"] == F.col("__an"))
            .groupBy(F.col("u").alias("node"))
            .agg(F.sum("__a").cast(dec).alias("hub")))
        # next round's lineage flows only through hub (auth is
        # re-derived from it), so hub alone needs truncation
        if i % checkpoint_every == 0:
            hub = hub.localCheckpoint(eager=True)
    out = (nodes
           .join(hub, "node", "left")
           .join(auth, "node", "left")
           .select("node",
                   F.coalesce(F.col("hub"), F.lit(0).cast(dec))
                   .cast(dec).cast("string").alias("hub"),
                   F.coalesce(F.col("auth"), F.lit(0).cast(dec))
                   .cast(dec).cast("string").alias("auth"))
           .localCheckpoint(eager=True))
    for c in cached:
        c.unpersist()
    return out


def neighbor_jaccard(edges: DataFrame, src: str = "src",
                     dst: str = "dst", min_common: int = 1,
                     max_degree: Optional[int] = None,
                     exclude_edges: bool = True) -> DataFrame:
    """Link-prediction features from neighborhood overlap: for node
    pairs sharing at least ``min_common`` UNDIRECTED neighbors, the
    common-neighbor count and the Jaccard coefficient
    ``|N(a) ∩ N(b)| / |N(a) ∪ N(b)|`` as an EXACT integer rational
    ``(jn, jd) = (common, deg_a + deg_b - common)`` — the classic
    "who should be linked" scores (Liben-Nowell & Kleinberg 2003),
    float-free so the driver oracle hash-matches (callers rank by
    cross-multiplication; Adamic-Adar needs a log contract and is
    deliberately left out).

    Candidate pairs are generated IN the shared neighbor's row (the
    q54 co-mention pattern: sorted neighbor array, i<j slice pairs —
    never a node-level self-join), then ONE combinable groupBy(a, b)
    counts shared neighbors.  ``max_degree`` caps the exploding
    neighbor list: a hub shared by more nodes than the cap is treated
    as NON-discriminative and generates no pairs (the q122/ifp_sameas
    hub-overflow discipline — at 10^9-degree hubs the d² pair
    explosion is the scale killer, and a hub everyone shares carries
    no link-prediction signal anyway; counts are then "common
    neighbors of degree <= cap", a documented semantic both engines
    apply identically).  Degrees stay the TRUE degrees.
    ``exclude_edges=True`` drops already-adjacent pairs (the
    link-PREDICTION protocol) with one anti-join against the
    symmetrized edge set.

    Output: ``(a, b, common, deg_a, deg_b, jn, jd)`` with a < b."""
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    if max_degree is not None and max_degree < 2:
        raise ValueError(f"max_degree must be >= 2, got {max_degree}")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (e.unionAll(e.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))
           .where(F.col("u") != F.col("v"))
           .distinct()
           .persist(StorageLevel.MEMORY_AND_DISK))
    # ONE aggregation serves both consumers: sym is distinct, so the
    # collected neighbor set's size IS the true degree — a separate
    # count groupBy would be a second graph-wide exchange for nothing
    lists_all = (sym.groupBy("u")
                 .agg(F.sort_array(F.collect_set("v")).alias("ns"))
                 .persist(StorageLevel.MEMORY_AND_DISK))
    deg = lists_all.select("u", F.size("ns").cast("long").alias("deg"))
    lists = lists_all
    if max_degree is not None:
        lists = lists_all.where(F.size("ns") <= max_degree)
    pairs = lists.select(F.explode(F.expr(
        "flatten(transform(ns, (x, i) -> "
        "transform(slice(ns, i + 2, size(ns)), "
        "y -> struct(x AS a, y AS b))))")).alias("p"))
    common = (pairs.select("p.a", "p.b")
              .groupBy("a", "b")
              .agg(F.count(F.lit(1)).alias("common"))
              .where(F.col("common") >= min_common))
    out = (
        common
        .join(deg.select(F.col("u").alias("a"),
                         F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("u").alias("b"),
                         F.col("deg").alias("deg_b")), "b")
    )
    if exclude_edges:
        out = out.join(sym.select(F.col("u").alias("a"),
                                  F.col("v").alias("b")),
                       ["a", "b"], "left_anti")
    res = out.select(
        "a", "b", "common", "deg_a", "deg_b",
        F.col("common").alias("jn"),
        (F.col("deg_a") + F.col("deg_b") - F.col("common")).alias("jd"),
    ).localCheckpoint(eager=True)
    sym.unpersist()
    lists_all.unpersist()
    return res


def personalized_pagerank(edges: DataFrame, sources: DataFrame,
                          src: str = "src", dst: str = "dst",
                          n_iters: int = 3, damping: float = 0.85,
                          checkpoint_every: int = 8) -> DataFrame:
    """Personalized PageRank / random walk with restart (Jeh & Widom
    2003; the entity-relatedness primitive): :func:`pagerank` with the
    teleport mass restricted to a SOURCE set — ``r_{k+1}(v) =
    (1-d)·1[v ∈ S]/|S| + d · Σ_{u→v} r_k(u)/outdeg(u)`` from the
    uniform-over-S start, so rank measures proximity TO the seeds
    ("which KG entities are most related to this query set"), not
    global centrality.

    Same shape as pagerank (undirected symmetrized edges, one
    co-partitioned join + one combinable groupBy-sum per iteration,
    degrees/edges persisted once, rank lineage truncated every
    ``checkpoint_every`` rounds), plus one full-outer join per round
    folding the walk mass with the source-only teleport term (nodes
    the walk has not reached yet hold rank 0 and stay ABSENT from the
    slim rank frame — the frontier-growth property that makes PPR on
    a 10^12-edge graph from a 10-seed set cheap: the rank frame is
    the reached set, not the node universe).  Fixed ``n_iters`` keeps
    it oracle-deterministic (unrolled SQL twin, driver q160); output
    covers ALL nodes with unreached ones at rank 0, rounded to 6
    decimals like pagerank."""
    if n_iters < 0:
        raise ValueError("n_iters must be >= 0")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    sym = e.unionByName(
        e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    deg = sym.groupBy("s").agg(F.count("*").alias("od"))
    out_edges = sym.join(deg, "s").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = sym.select(F.col("s").alias("node")).distinct()
    srcs = (sources.select(F.col(sources.columns[0]).alias("node"))
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK))
    n_src = srcs.count()  # one action: sizes the teleport term
    if n_src == 0:
        raise ValueError("sources must name at least one node")
    teleport = (1.0 - damping) / n_src
    tele = srcs.withColumn("tp", F.lit(teleport))
    ranks = srcs.withColumn("rank", F.lit(1.0 / n_src))
    for i in range(n_iters):
        contrib = (
            out_edges.join(ranks, out_edges["s"] == ranks["node"])
            .select(F.col("t").alias("node"),
                    (F.col("rank") / F.col("od")).alias("c"))
        )
        walk = (contrib.groupBy("node")
                .agg((damping * F.sum("c")).alias("w")))
        ranks = (walk.join(tele, "node", "full")
                 .select("node",
                         (F.coalesce("w", F.lit(0.0))
                          + F.coalesce("tp", F.lit(0.0))).alias("rank")))
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iters:
            ranks = ranks.localCheckpoint(eager=True)
    out = nodes.join(ranks, "node", "left").select(
        "node",
        F.round(F.coalesce("rank", F.lit(0.0)), 6).alias("rank"),
    ).localCheckpoint(eager=True)
    # match the sibling operators' discipline (hits_scores, shortest_paths,
    # wl_colors): eager-checkpoint the result, then free the per-call
    # caches so a long-lived session doesn't accumulate them
    for c in (sym, out_edges, srcs):
        c.unpersist()
    return out
