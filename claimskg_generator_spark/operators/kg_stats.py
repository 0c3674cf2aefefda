"""KG dataset statistics — W3C VoID descriptions and characteristic
sets over a ``(subj, pred, obj)`` triple table.

A published knowledge graph ships with a statistical self-description:
the W3C VoID vocabulary (https://www.w3.org/TR/void/) standardizes the
dataset-level counts (void:triples, void:distinctSubjects, ...) and the
per-property / per-class partitions every LOD endpoint publishes, and
characteristic sets (Neumann & Moerkotte, "Characteristic Sets:
Accurate Cardinality Estimation for RDF Queries with Multiple Joins",
ICDE 2011) are the structure summary RDF stores build for join
cardinality estimation.  The reference publishes ClaimsKG with exactly
such a VoID+stats sidecar (its stats output — reference export.py's
counters — is the ad-hoc version of this); here both are deterministic
one-operator aggregations.

Scale shape: :func:`void_stats` is two groupBys and one single-row
aggregate — the per-property partition is a plain map-side-combinable
groupBy(pred) (predicate vocabularies are KB-sized, so the shuffle
carries one row per predicate per task), the per-class partition
aggregates only the ``rdf:type`` sliver (predicate pushdown keeps the
scan narrow), and the dataset-level distincts run in ONE pass with
conditional count_distincts.  ``approx=True`` swaps every exact
count_distinct for HLL approx_count_distinct — at 10^12 triples the
exact distinct-subject count is itself a giant shuffle, and VoID
consumers use these numbers for planning, not accounting.
:func:`characteristic_sets` is one groupBy(subj) (bounded fan-in: a
subject's predicate set, not its triples, travels) and one KB-sized
regroup on the set fingerprint.
"""

from functools import reduce
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
VOID = "http://rdfs.org/ns/void#"

#: metric name -> VoID predicate, for :func:`void_rdf`
_VOID_PREDS = {
    "triples": VOID + "triples",
    "distinct_subjects": VOID + "distinctSubjects",
    "distinct_objects": VOID + "distinctObjects",
    "properties": VOID + "properties",
    "classes": VOID + "classes",
    "entities": VOID + "entities",
}

_OUT_COLS = ["scope", "key", "metric", "value"]


def _cd(col, approx: bool) -> Column:
    return (F.approx_count_distinct(col) if approx
            else F.count_distinct(col))


def void_stats(triples: DataFrame, approx: bool = False) -> DataFrame:
    """The VoID statistical description of a triple table, long format:
    ``(scope, key, metric, value)``.

    * ``scope='dataset', key=''`` — whole-graph counts: ``triples``,
      ``distinct_subjects``, ``distinct_objects``, ``properties``
      (distinct predicates), ``classes`` (distinct rdf:type objects),
      ``entities`` (distinct typed subjects — the VoID reading of
      void:entities as "resources of some class in the dataset").
    * ``scope='property', key=<predicate>`` — void:propertyPartition
      rows: ``triples``, ``distinct_subjects``, ``distinct_objects``.
    * ``scope='class', key=<class IRI>`` — void:classPartition rows:
      ``entities`` (distinct instances).

    Input should be the set-deduped graph (VoID counts are set counts;
    a bag input simply makes ``triples`` a bag count).  ``approx=True``
    uses HLL sketches for every distinct count (the 100 TB path; the
    value oracle checks the exact mode).
    """
    one = triples.agg(
        F.count(F.lit(1)).alias("triples"),
        _cd(F.col("subj"), approx).alias("distinct_subjects"),
        _cd(F.col("obj"), approx).alias("distinct_objects"),
        _cd(F.col("pred"), approx).alias("properties"),
        _cd(F.when(F.col("pred") == RDF_TYPE, F.col("obj")),
            approx).alias("classes"),
        _cd(F.when(F.col("pred") == RDF_TYPE, F.col("subj")),
            approx).alias("entities"),
    )
    names = ["triples", "distinct_subjects", "distinct_objects",
             "properties", "classes", "entities"]
    stack = ", ".join(f"'{n}', {n}" for n in names)
    dataset = one.selectExpr(
        "'dataset' AS scope", "'' AS key",
        f"stack({len(names)}, {stack}) AS (metric, value)")

    per_prop = triples.groupBy(F.col("pred").alias("key")).agg(
        F.count(F.lit(1)).alias("triples"),
        _cd(F.col("subj"), approx).alias("distinct_subjects"),
        _cd(F.col("obj"), approx).alias("distinct_objects"),
    ).selectExpr(
        "'property' AS scope", "key",
        "stack(3, 'triples', triples,"
        " 'distinct_subjects', distinct_subjects,"
        " 'distinct_objects', distinct_objects) AS (metric, value)")

    per_class = (
        triples.where(F.col("pred") == RDF_TYPE)
        .groupBy(F.col("obj").alias("key"))
        .agg(_cd(F.col("subj"), approx).alias("value"))
        .select(F.lit("class").alias("scope"), "key",
                F.lit("entities").alias("metric"), "value")
    )
    out = dataset.select(*_OUT_COLS).unionAll(
        per_prop.select(*_OUT_COLS)).unionAll(
        per_class.select(*_OUT_COLS))
    return out.withColumn("value", F.col("value").cast("bigint"))


def void_rdf(triples: DataFrame, dataset_uri: str,
             approx: bool = False) -> DataFrame:
    """The same statistics rendered as VoID RDF ``(subj, pred, obj,
    okind)`` triples — the publication face a LOD consumer dereferences.

    Partition nodes are minted deterministically from the partition key
    (``<dataset>/prop-<md5(pred)>`` / ``<dataset>/class-<md5(class)>``)
    so the description is replayable; counts are plain integer
    literals.  A pure projection of :func:`void_stats` — pinned equal
    to it by the round-trip pytest, no second aggregation.
    """
    st = void_stats(triples, approx=approx)
    val = F.col("value").cast("string")
    ds = F.lit(dataset_uri)

    dataset = st.where(F.col("scope") == "dataset").select(
        ds.alias("subj"),
        _void_pred_col().alias("pred"),
        val.alias("obj"), F.lit("").alias("okind"))
    type_row = st.sparkSession.sql(
        "SELECT '{d}' AS subj, '{t}' AS pred, '{v}Dataset' AS obj, "
        "'uri' AS okind".format(d=dataset_uri.replace("'", "''"),
                                t=RDF_TYPE, v=VOID))

    def partition(scope: str, link: str, key_pred: str,
                  node_tag: str) -> DataFrame:
        part = st.where(F.col("scope") == scope)
        node = F.concat(ds, F.lit(f"/{node_tag}-"), F.md5("key"))
        return (
            part.select(ds.alias("subj"), F.lit(link).alias("pred"),
                        node.alias("obj"), F.lit("uri").alias("okind"))
            .unionAll(part.select(
                node.alias("subj"), F.lit(key_pred).alias("pred"),
                F.col("key").alias("obj"), F.lit("uri").alias("okind")))
            .unionAll(part.select(
                node.alias("subj"), _void_pred_col().alias("pred"),
                val.alias("obj"), F.lit("").alias("okind")))
        )

    out = type_row.unionAll(dataset).unionAll(
        partition("property", VOID + "propertyPartition",
                  VOID + "property", "prop")).unionAll(
        partition("class", VOID + "classPartition",
                  VOID + "class", "class"))
    return out.distinct()


def _void_pred_col() -> Column:
    expr = F
    for name, pred in _VOID_PREDS.items():
        expr = expr.when(F.col("metric") == name, F.lit(pred))
    return expr


def void_sketch(triples: DataFrame, p: int = 12) -> DataFrame:
    """Mergeable VoID sketch — the monoid state from which
    :func:`void_estimate` reproduces the whole VoID description, so the
    published sidecar can be maintained INCREMENTALLY: sketch each new
    data increment, merge registers, re-estimate — never rescan the
    graph (the q82/q91 continuous-aggregate pattern applied to VoID;
    exact re-aggregation of distinct counts is impossible without the
    full history, which is exactly what HLL registers replace).

    State: ``(scope, key, metric, reg_idx, max_rho, cnt)`` — one row
    per touched HLL register per partition dimension (``cnt`` NULL),
    plus plain count rows at ``reg_idx = -1`` (``max_rho`` NULL).  The
    merge is a per-column monoid: ``max`` over registers, ``sum`` over
    counts (:func:`void_sketch_merge`).

    Scale shape: ONE pass — every row emits its register/count
    contributions IN-ROW (array + explode, ~9 narrow rows), then one
    combinable groupBy; compare the three aggregation branches of the
    exact :func:`void_stats`.  State size is bounded by
    (partitions × 2^p), not by the data.
    """
    from claimskg_generator_spark.operators.sketches import (
        hll_register_cols,
    )

    def reg(scope, key, metric, value_col):
        idx, rho = hll_register_cols(value_col, p)
        return F.struct(
            F.lit(scope).alias("scope"), key.alias("key"),
            F.lit(metric).alias("metric"),
            idx.cast("long").alias("reg_idx"),
            rho.cast("int").alias("max_rho"),
            F.lit(None).cast("long").alias("cnt"))

    def count_row(scope, key):
        return F.struct(
            F.lit(scope).alias("scope"), key.alias("key"),
            F.lit("triples").alias("metric"),
            F.lit(-1).cast("long").alias("reg_idx"),
            F.lit(None).cast("int").alias("max_rho"),
            F.lit(1).cast("long").alias("cnt"))

    e = F.lit("")
    subj, pred, obj = F.col("subj"), F.col("pred"), F.col("obj")
    base = F.array(
        count_row("dataset", e),
        count_row("property", pred),
        reg("dataset", e, "distinct_subjects", subj),
        reg("dataset", e, "distinct_objects", obj),
        reg("dataset", e, "properties", pred),
        reg("property", pred, "distinct_subjects", subj),
        reg("property", pred, "distinct_objects", obj),
    )
    typed = F.array(
        reg("dataset", e, "classes", obj),
        reg("dataset", e, "entities", subj),
        reg("class", obj, "entities", subj),
    )
    contrib = F.when(pred == RDF_TYPE,
                     F.concat(base, typed)).otherwise(base)
    return (
        triples.select(F.explode(contrib).alias("c"))
        .select("c.*")
        .groupBy("scope", "key", "metric", "reg_idx")
        .agg(F.max("max_rho").alias("max_rho"),
             F.sum("cnt").alias("cnt"))
    )


def void_sketch_merge(*sketches: DataFrame) -> DataFrame:
    """Merge :func:`void_sketch` frames from disjoint data increments:
    register-wise max, count-wise sum — associative, commutative,
    idempotent on registers, so arrival order and regrouping never
    change the estimate."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("scope", "key", "metric", "reg_idx").agg(
        F.max("max_rho").alias("max_rho"),
        F.sum("cnt").alias("cnt"))


def void_estimate(sketch: DataFrame, p: int = 12) -> DataFrame:
    """The VoID description from a (merged) sketch — same output shape
    as the exact :func:`void_stats` ``(scope, key, metric, value)``:
    exact ``triples`` counts from the count rows, HLL estimates
    (operators/sketches.hll_estimate — exact decimal harmonic sum, so
    the estimate is bit-replayable cross-engine) rounded to integers
    for every distinct metric."""
    from claimskg_generator_spark.operators.sketches import hll_estimate

    counts = (sketch.where(F.col("reg_idx") == -1)
              .select("scope", "key", "metric",
                      F.col("cnt").cast("bigint").alias("value")))
    regs = (sketch.where(F.col("reg_idx") >= 0)
            .select("scope", "key", "metric", "reg_idx", "max_rho"))
    est = hll_estimate(regs, p=p).select(
        "scope", "key", "metric",
        F.round(F.col("est_distinct"), 0).cast("bigint").alias("value"))
    return counts.unionAll(est)


def characteristic_sets(triples: DataFrame,
                        max_set_preds: Optional[int] = None) -> DataFrame:
    """Characteristic sets (Neumann & Moerkotte, ICDE 2011): partition
    subjects by their exact set of distinct predicates and count each
    partition — the structure summary an RDF store uses to estimate
    star-join cardinalities (the number of subjects matching a BGP star
    is at most the sum of ``entities`` over the supersets of its
    predicate set).

    Output: ``(predset, entities, triples)`` — ``predset`` the
    comma-joined sorted distinct predicates (deterministic fingerprint),
    ``entities`` the number of subjects carrying exactly that set,
    ``triples`` their total triple count (so ``triples / entities`` is
    the mean multiplicity the estimator divides by).

    ``max_set_preds`` guards the degenerate hub case: a subject with
    more distinct predicates is folded into the single overflow set
    ``'*'`` instead of minting an unbounded-width fingerprint string
    (same documented-cap policy as the dedup posting lists).

    Scale: one groupBy(subj) whose combinable state is the predicate
    SET (bounded by the vocabulary, not the subject's triple count),
    then a KB-sized regroup on the fingerprint.

    Incremental maintenance under graph change (the charsets feeding
    ``bgp_query`` join ordering should stay fresh without rescanning
    10^12 triples): the summary itself is NOT a monoid — removing one
    triple can move a subject between fingerprints — but the
    PER-SUBJECT (subj, pred, n) count frame underneath it is plain
    additive state.  :func:`charset_state` builds it,
    :func:`charset_apply` folds a triple delta in (adds +1 per row,
    deletes -1 — the cdc/diff_snapshots output shape), and
    :func:`charsets_from_state` re-derives this summary from the
    state's live rows.  The driver row (q132) pins the identity
    ``charsets_from_state(charset_apply(charset_state(A), adds, dels))
    == characteristic_sets((A + adds) - dels)`` against a direct
    oracle replay.
    """
    per_subj = triples.groupBy("subj").agg(
        F.sort_array(F.collect_set("pred")).alias("preds"),
        F.count(F.lit(1)).cast("bigint").alias("n"))
    return _charsets_regroup(per_subj, max_set_preds)


def _charsets_regroup(per_subj: DataFrame,
                      max_set_preds: Optional[int]) -> DataFrame:
    """Shared tail of :func:`characteristic_sets` /
    :func:`charsets_from_state`: fingerprint the per-subject
    ``(preds sorted-array, n)`` frame and regroup on it."""
    fp = F.array_join(F.col("preds"), ",")
    if max_set_preds is not None:
        if max_set_preds < 1:
            raise ValueError(
                f"max_set_preds must be >= 1, got {max_set_preds}")
        fp = F.when(F.size("preds") > max_set_preds,
                    F.lit("*")).otherwise(fp)
    return (
        per_subj.select(fp.alias("predset"), "n")
        .groupBy("predset")
        .agg(F.count(F.lit(1)).alias("entities"),
             F.sum("n").cast("bigint").alias("triples"))
    )


def charset_state(triples: DataFrame) -> DataFrame:
    """The additive per-subject state under characteristic sets:
    ``(subj, pred, n)`` — n the triple count of the pair (bag count,
    so the state replays exactly what :func:`characteristic_sets`
    would count over the same frame).  One map-side-combinable
    groupBy; rows are bounded by |subjects| x |their predicates|, the
    same order as the graph's distinct (subj, pred) pairs."""
    return triples.groupBy("subj", "pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))


def charset_state_merge(*states: DataFrame) -> DataFrame:
    """Fold ``(subj, pred, n)`` state frames by summing ``n`` — the
    monoid merge (deletes travel as negative n).  Zero-count pairs
    compact away; a NEGATIVE survivor means a delete that never
    existed and is kept (not clamped) so
    :func:`charsets_from_state`'s ``n > 0`` gate surfaces it as a
    missing subject rather than silently absorbing the error."""
    if not states:
        raise ValueError("need at least one state frame")
    merged = reduce(DataFrame.unionAll,
                    [s.select("subj", "pred", "n") for s in states])
    return (merged.groupBy("subj", "pred")
            .agg(F.sum("n").cast("bigint").alias("n"))
            .where(F.col("n") != 0))


def charset_apply(state: DataFrame,
                  adds: Optional[DataFrame] = None,
                  dels: Optional[DataFrame] = None) -> DataFrame:
    """Apply a triple delta to charset state: ``adds`` / ``dels`` are
    triple frames (e.g. the two sides of ``diff_snapshots``); each
    side folds in as +/-1 per row through ONE merge shuffle."""
    parts = [state]
    if adds is not None:
        parts.append(charset_state(adds))
    if dels is not None:
        parts.append(charset_state(dels)
                     .withColumn("n", (-F.col("n")).cast("bigint")))
    if len(parts) == 1:
        return state
    return charset_state_merge(*parts)


def charsets_from_state(state: DataFrame,
                        max_set_preds: Optional[int] = None) -> DataFrame:
    """Re-derive the :func:`characteristic_sets` summary from
    ``(subj, pred, n)`` state — identical output frame.  Only live
    pairs (n > 0) contribute; the groupBy(subj) here carries one row
    per (subj, pred) pair instead of one per triple, so a refresh
    after applying a delta is CHEAPER than the original build."""
    live = state.where(F.col("n") > 0)
    per_subj = live.groupBy("subj").agg(
        F.sort_array(F.collect_set("pred")).alias("preds"),
        F.sum("n").cast("bigint").alias("n"))
    return _charsets_regroup(per_subj, max_set_preds)
