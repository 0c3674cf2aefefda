"""Basic-graph-pattern (BGP) queries over a (subj, pred, obj) triple
table — the query face of the materialized KG.

The reference consumes its graph through SPARQL endpoints (reference
claimskg/reconciler/__init__.py issues SPARQL over the loaded graph);
a Spark-native KG needs the same capability over the triple TABLE: a
conjunctive pattern like

    (?f, code:imports, ?m), (?m, rdfs:label, ?l), (?f, schema:repo, ?r)

is a chain of equi-joins over per-pattern scans.  This module compiles
exactly that, with the three plan properties that matter at
10^12-triple scale:

* **Literal pushdown**: every literal position becomes a filter ON THE
  PATTERN'S OWN SCAN, before any join — a pred-literal pattern reads
  one predicate's sliver (and through sources/snapshot_table.read's
  stats pruning or a pred-clustered parquet layout, one sliver of
  FILES, not a full scan).
* **Selectivity-greedy join order**: patterns join most-literal-first,
  and each next pattern must share >= 1 variable with the accumulated
  frame (equi-join keys).  A conjunction whose join graph is
  disconnected would be a cartesian product — rejected loudly instead
  of silently exploding.
* **Equi-joins only**: shared variables become hash-join keys; AQE
  picks broadcast vs shuffle per pattern sliver at runtime.

Variables are ``?name`` strings; anything else is a literal matched
against subj/pred/obj.  A variable bound in two positions of ONE
pattern (e.g. ``(?x, p, ?x)``) compiles to an intra-row equality
filter.  Duplicate rows follow SQL bag semantics (SPARQL's default);
``distinct=True`` applies the set projection.
"""

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def predicate_profile(triples: DataFrame) -> DataFrame:
    """Per-predicate graph statistics: triple count, distinct subjects,
    distinct objects — the KG's equivalent of table/column cardinality
    stats (one combinable groupBy; predicate vocabulary is tiny next to
    the corpus).  Besides profiling, this is the stats table
    :func:`bgp_query` consumes to order joins by ESTIMATED CARDINALITY
    instead of the literal-count heuristic — at 10^12 triples the
    difference between starting a BGP from a 50-row predicate sliver
    and a 10^11-row one is the whole plan."""
    return triples.groupBy("pred").agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("subj").alias("n_subj"),
        F.countDistinct("obj").alias("n_obj"),
    )


def _estimate(pat, stats: dict) -> float:
    """Estimated result rows of one pattern against the stats table:
    the predicate's triple count, divided by its distinct-subject
    (resp. -object) cardinality for each bound subject/object literal
    (independence assumption — the textbook selectivity model).  An
    unbound predicate sums the whole table; an unknown predicate
    estimates 0 rows (it matches nothing)."""
    s, p, o = pat
    if _is_var(p):
        n = float(sum(r[0] for r in stats.values())) or 1.0
        subj_card = max(r[1] for r in stats.values()) if stats else 1
        obj_card = max(r[2] for r in stats.values()) if stats else 1
    else:
        if p not in stats:
            return 0.0
        n, subj_card, obj_card = (float(stats[p][0]),) + stats[p][1:]
    est = n
    if not _is_var(s):
        est /= max(subj_card, 1)
    if not _is_var(o):
        est /= max(obj_card, 1)
    return est


def bgp_query(
    triples: DataFrame,
    patterns: Sequence[Tuple[str, str, str]],
    select: Optional[Sequence[str]] = None,
    distinct: bool = False,
    stats: Optional[dict] = None,
    optional: Optional[Sequence[Sequence[Tuple[str, str, str]]]] = None,
    not_exists: Optional[Sequence[Sequence[Tuple[str, str, str]]]] = None,
) -> DataFrame:
    """Evaluate a conjunctive triple-pattern query against ``triples``.

    ``patterns``: (s, p, o) terms, each a ``?var`` or a literal string.
    ``select``: variables to project (default: all, sorted).  Returns
    one column per selected variable (named without the ``?``).

    ``stats``: optional ``{pred: (n_triples, n_subj, n_obj)}`` —
    typically ``{r['pred']: (r['n_triples'], r['n_subj'], r['n_obj'])
    for r in predicate_profile(t).collect()}``, computed once per graph
    version and reused across queries.  With stats, patterns join in
    estimated-cardinality order (cheapest sliver first); without, the
    fewest-variables heuristic stands in.

    ``optional``: pattern groups LEFT-joined on their shared variables
    (SPARQL OPTIONAL — unmatched rows carry NULLs in the group's
    exclusive variables).  ``not_exists``: pattern groups anti-joined
    (SPARQL FILTER NOT EXISTS).  Each group is itself a BGP; a group
    sharing no variable with the required patterns is rejected.
    """
    if not patterns:
        raise ValueError("need at least one pattern")
    for t in patterns:
        if len(t) != 3:
            raise ValueError(f"pattern must be a (s, p, o) triple: {t!r}")
        if not any(_is_var(x) for x in t):
            raise ValueError(
                f"pattern {t!r} has no variables; ASK-style existence "
                "checks are a filter, not a BGP column")

    def compile_pattern(pat) -> Tuple[DataFrame, set]:
        df = triples
        cols, seen = [], {}
        for pos, term in zip(_POS, pat):
            if _is_var(term):
                v = term[1:]
                if v in seen:  # same var twice in one pattern
                    df = df.filter(F.col(pos) == F.col(seen[v]))
                else:
                    seen[v] = pos
                    cols.append(F.col(pos).alias(v))
            else:
                df = df.filter(F.col(pos) == term)
        return df.select(*cols), set(seen)

    # greedy order: cheapest first — estimated cardinality when stats
    # are supplied, else fewest variables (most literals); then any
    # pattern sharing a variable with what's bound, cheapest-first
    if stats is not None:
        cost = {id(p): _estimate(p, stats) for p in patterns}
        keyf = lambda fv: cost[fv[2]]  # noqa: E731
    else:
        keyf = lambda fv: len(fv[1])  # noqa: E731
    remaining = sorted(
        ((*compile_pattern(p), id(p)) for p in patterns),
        key=keyf,
    )
    out, bound = remaining.pop(0)[:2]
    while remaining:
        i = next(
            (j for j, (_df, vs, _pid) in enumerate(remaining)
             if vs & bound),
            None,
        )
        if i is None:
            raise ValueError(
                "disconnected pattern graph (no shared variables) — this "
                "would be a cartesian product; split the query instead")
        df, vs, _pid = remaining.pop(i)
        out = out.join(df, sorted(vs & bound))
        bound |= vs
    # OPTIONAL groups: each evaluated as its own BGP and LEFT-joined on
    # the shared variables — unmatched rows keep NULLs in the group's
    # exclusive variables (SPARQL OPTIONAL semantics)
    for group in optional or ():
        gdf = bgp_query(triples, group, stats=stats)
        gvars = set(gdf.columns)
        keys = sorted(gvars & bound)
        if not keys:
            raise ValueError(
                f"optional group {group!r} shares no variable with the "
                "required patterns — it would be a cartesian product")
        out = out.join(gdf, keys, "left")
        bound |= gvars
    # NOT EXISTS groups: anti-join on the shared variables — rows with
    # ANY matching group binding are dropped; binds nothing new
    for group in not_exists or ():
        gdf = bgp_query(triples, group, stats=stats)
        keys = sorted(set(gdf.columns) & bound)
        if not keys:
            raise ValueError(
                f"not_exists group {group!r} shares no variable with the "
                "required patterns — the filter would be constant")
        out = out.join(gdf.select(*keys), keys, "left_anti")
    sel: List[str] = (
        sorted(bound) if select is None
        else [v[1:] if v.startswith("?") else v for v in select]
    )
    missing = [v for v in sel if v not in bound]
    if missing:
        raise ValueError(f"selected variables not bound: {missing}")
    out = out.select(*sel)
    return out.distinct() if distinct else out
