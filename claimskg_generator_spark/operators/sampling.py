"""Deterministic stratified corpus sampling (domain / language mixing).

A pre-training pipeline re-weights its corpus by stratum (language,
source domain, quality band) before tokenization.  `df.sample` is
nondeterministic across retries and partitionings, so at scale the
standard trick is a HASH GATE: keep a row iff a stable hash of its id
falls below the stratum's rate threshold.  The decision is a pure
function of (id, stratum) — reproducible run-to-run, under AQE retries,
and across engines (md5 is shared with DuckDB, so the driver's oracle
re-derives the exact sample).

Pure narrow map: no shuffle, no state, trivially parallel at 100 TB.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 16-bit hash gate: compare the first 4 hex chars of md5(id) against
# rate * 0x10000, rendered as a 4-char lowercase hex literal.  String
# comparison == numeric comparison because both sides are fixed-width hex.
_GATE_BITS = 16


def _threshold_hex(rate: float) -> str:
    return format(min(int(rate * (1 << _GATE_BITS)), (1 << _GATE_BITS)), "04x")


def hash_gate(id_col: Column, rate: float) -> Column:
    """True iff this id survives a `rate`-probability deterministic gate."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return F.lit(True)
    return F.substring(F.md5(id_col.cast("string")), 1, 4) < F.lit(
        _threshold_hex(rate)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    id_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically.

    `rates` maps stratum value -> keep probability; strata not listed use
    `default_rate`.  The rate dispatch is a when-chain (a handful of
    strata), not a join — zero shuffle.
    """
    sid = F.col(id_col)
    keep = None
    for value, rate in sorted(rates.items()):
        cond = hash_gate(sid, rate) & (F.col(strata_col) == value)
        keep = cond if keep is None else keep | cond
    # NULL strata route to the default gate: bare ~isin(...) is NULL (not
    # True) for a NULL stratum, which would silently drop those rows no
    # matter what default_rate says
    others = (
        (F.col(strata_col).isNull() | ~F.col(strata_col).isin(*rates.keys()))
        if rates else F.lit(True)
    )
    default_gate = hash_gate(sid, default_rate) & others
    keep = default_gate if keep is None else keep | default_gate
    return df.filter(keep)


def assign_splits(
    df: DataFrame,
    id_col: str,
    fractions: Mapping[str, float] | None = None,
) -> DataFrame:
    """Deterministic train/val/test assignment: a PARTITION of the corpus
    (every row gets exactly one split), not a filter.  The split is a
    pure function of md5(id) against cumulative fraction thresholds —
    stable across runs, retries, partitionings, and engines, and rows
    never migrate between splits when unrelated data changes (the
    property `randomSplit` cannot give you).  Narrow map, zero shuffle.
    """
    fractions = dict(fractions or {"train": 0.8, "val": 0.1, "test": 0.1})
    if not fractions:
        raise ValueError("fractions must be non-empty")
    if any(not 0.0 <= v <= 1.0 for v in fractions.values()):
        raise ValueError(f"each fraction must be in [0, 1], got {fractions}")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    names = list(fractions)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        # cum >= 1 must short-circuit to True: _threshold_hex(1.0) is the
        # 5-char '10000', which string-compares BELOW hashes starting
        # a-f and would misroute them into a zero-fraction tail split
        cond = (F.lit(True) if cum >= 1.0 - 1e-9
                else h < F.lit(_threshold_hex(cum)))
        branch = F.when(cond, F.lit(name))
        expr = branch if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def temperature_mix(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture reweighting (the alpha-scaled domain
    sampling of multilingual pre-training, e.g. mT5's p_d ∝ n_d^alpha):
    flatten a skewed domain/language distribution by keeping domain d
    with rate r_d = min(1, target_frac * N * n_d^alpha / (Σ_e n_e^alpha
    * n_d)) — expected kept volume = target_frac * N distributed by the
    tempered weights, so alpha < 1 up-samples small domains relative to
    big ones.

    The keep decision is the same deterministic md5 hash gate as
    stratified_sample, but the per-domain rate is DATA-DEPENDENT: one
    tiny groupBy computes domain counts, a one-row aggregate the
    normalizer, and the slim rate dim broadcasts back — the corpus
    itself is touched by exactly one narrow gated scan.  Rates are
    quantized to 6 decimals before the 16-bit threshold so the oracle's
    pow() reproduces the exact same gate.

    Output: the kept rows plus their domain's ``mix_rate``.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 0.0 <= target_frac <= 1.0:
        raise ValueError(f"target_frac must be in [0, 1], got {target_frac}")
    counts = df.groupBy(group_col).agg(F.count("*").alias("__tm_n"))
    totals = counts.agg(
        F.sum("__tm_n").alias("__tm_total"),
        F.sum(F.pow("__tm_n", F.lit(alpha))).alias("__tm_sumw"),
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        group_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(target_frac) * F.col("__tm_total")
                * F.pow("__tm_n", F.lit(alpha))
                / F.col("__tm_sumw") / F.col("__tm_n"),
            ),
            6,
        ).alias("mix_rate"),
    )
    # null-safe join: groupBy keeps a NULL domain as a real group, and a
    # plain equi-join would silently drop its rows here (the same silent
    # NULL-drop class as stratified_sample's r4 fix)
    r = rates.withColumnRenamed(group_col, "__tm_g")
    d = df.join(
        F.broadcast(r), F.col(group_col).eqNullSafe(F.col("__tm_g"))
    ).drop("__tm_g")
    # data-dependent twin of hash_gate: same 16-bit md5 threshold, with
    # the rate >= 1 short-circuit (the 5-char '10000' string-compare trap)
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    thresh = F.format_string(
        "%04x", F.floor(F.col("mix_rate") * (1 << _GATE_BITS)).cast("int")
    )
    return d.filter((F.col("mix_rate") >= 1.0) | (h < thresh))


def budget_cap(
    df: DataFrame,
    group_col: str,
    size_col: str,
    id_col: str,
    budget: int,
    n_buckets: int = 256,
) -> DataFrame:
    """Per-group size-budget selection: keep, for every group (domain /
    source / language), a deterministic pseudo-random prefix of its rows
    whose cumulative ``size_col`` stays within ``budget`` — the "take N
    tokens per domain" corpus-mixing step of a pre-training pipeline.

    Order within a group is md5(id) (ties broken by id): stable across
    runs, retries, partitionings, and engines, so adding rows to one
    group never changes which EARLIER-hashed rows of any group survive.

    Scale shape: the naive form is one window per group, which puts an
    entire group in one task — a 50 TB domain would be a single-partition
    cumsum.  This is the grouped variant of packing.with_pack_offsets's
    two-phase distributed prefix sum instead: rows bucket by the first
    hex byte of their order hash (a PREFIX of the order key, so bucket
    order == hash order), per-(group, bucket) totals get the running sum
    on a tiny table (``n_buckets`` rows per group), and the within-bucket
    cumsum runs under partitionBy(group, bucket) — parallel across
    buckets even inside one group.  No task ever holds more than
    1/``n_buckets`` of a group.

    Output: the surviving rows of ``df`` plus ``cum_size`` (cumulative
    size including this row, in selection order).
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    if not 1 <= n_buckets <= 65536:
        raise ValueError("n_buckets must be in [1, 65536]")
    # bucket = a PREFIX of the order hash scaled into [0, n_buckets):
    # 2 leading hex chars cover n_buckets <= 256, 4 cover <= 65536; the
    # floor-scaled form keeps bucket order == hash order (the two-phase
    # correctness requirement), unlike a modulo
    n_hex = 2 if n_buckets <= 256 else 4
    h = F.md5(F.col(id_col).cast("string"))
    bucket = (
        F.conv(F.substring(h, 1, n_hex), 16, 10).cast("bigint")
        * n_buckets / (16 ** n_hex)
    ).cast("int")
    d = df.withColumn("__bc_h", h).withColumn("__bc_b", bucket)
    totals = d.groupBy(group_col, "__bc_b").agg(
        F.sum(F.col(size_col).cast("bigint")).alias("__bc_total")
    )
    wb = Window.partitionBy(group_col).orderBy("__bc_b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prefixes = totals.select(
        group_col,
        "__bc_b",
        (F.sum("__bc_total").over(wb) - F.col("__bc_total")).alias(
            "__bc_prefix"
        ),
    )
    win = Window.partitionBy(group_col, "__bc_b").orderBy(
        "__bc_h", id_col
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.col("__bc_prefix") + F.sum(
        F.col(size_col).cast("bigint")
    ).over(win)
    # the per-(group, bucket) prefix table is slim (n_buckets rows per
    # group) but not necessarily broadcast-small when groups number in
    # the millions — leave the join strategy to AQE.  Null-safe on the
    # group key: a NULL group is a real group (its own budget), not a
    # silent drop
    p = prefixes.withColumnRenamed(group_col, "__bc_g")
    return (
        d.join(p, F.col(group_col).eqNullSafe(F.col("__bc_g"))
               & (d["__bc_b"] == p["__bc_b"]))
        .drop(p["__bc_b"]).drop("__bc_g")
        .withColumn("cum_size", cum)
        .filter(F.col("cum_size") <= budget)
        .drop("__bc_h", "__bc_b", "__bc_prefix")
    )


def optimize_layout(
    df: DataFrame,
    by: "list[str]",
    n_partitions: int | None = None,
) -> DataFrame:
    """Cluster data for stats-based file skipping: range-partition on the
    given columns, then sort within each partition.  Every output file
    then covers a narrow [min, max] band of the layout keys, so a
    manifest reader (sources/snapshot_table.py) or parquet row-group
    pruning skips most files for a selective predicate on those columns
    — the single biggest scan-cost lever at 100 TB after partitioning
    itself (this is the sort-cluster half of what table formats call
    OPTIMIZE / Z-ORDER; a true multi-dimensional Z-order adds a bit-
    interleaved sort key on top of exactly this shape).

    One range shuffle (with Spark's range-boundary sampling) + an
    in-partition sort — no other cost.
    """
    if not by:
        raise ValueError("need at least one layout column")
    cols = [F.col(c) for c in by]
    part = (
        df.repartitionByRange(n_partitions, *cols)
        if n_partitions
        else df.repartitionByRange(*cols)
    )
    return part.sortWithinPartitions(*cols)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    by: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — ``k`` rows
    drawn with probability proportional to ``weight_col`` (Efraimidis &
    Spirakis 2006 A-ES priority sampling: priority = ln(u)/w for a
    uniform u, keep the k largest; equivalent to ranking u^(1/w)).

    The uniform is derived from md5(id) (first 8 hex chars → a 32-bit
    integer scaled to [0, 1)), so the sample is a pure function of the
    row — stable under retries, repartitioning, AQE re-plans, and
    replayable by any SQL engine ('0x'-cast in DuckDB, conv() here).
    The mid-point nudge (+0.5) keeps u strictly inside (0, 1) so ln(u)
    is finite.  Priorities are ROUNDED (8 dp) before ranking with an id
    tie-break, so the selected set is engine-stable the same way the
    q64 percentile gate is.

    ``by=None`` draws one global sample: Spark plans orderBy().limit(k)
    as TakeOrderedAndProject — per-partition top-k heaps + a driver
    merge of k·P candidates, NO global sort shuffle.  With ``by``, the
    draw is per group via a partitioned window (one shuffle on the
    group key).

    Non-positive or NULL weights are excluded (zero-weight rows can
    never be drawn); NULL ids are excluded too — they would carry a
    NULL priority, whose sort position is engine-dependent.

    The missing member of the sampling family next to hash_gate /
    stratified_sample / assign_splits (all uniform-rate): sampling
    proportional to a quality or importance score is how a curated
    subcorpus is drawn from scored documents (e.g. the DSIR weights of
    operators/selection.py).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (
        (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16, 10).cast("double") + F.lit(0.5))
        / F.lit(float(1 << 32))
    )
    w = F.col(weight_col).cast("double")
    pri = F.round(F.log(u) / w, 8)
    scored = (
        df.filter(w.isNotNull() & (w > 0) & F.col(id_col).isNotNull())
        .withColumn("priority", pri)
    )
    if by is None:
        return scored.orderBy(F.desc("priority"), F.col(id_col)).limit(k)
    win = Window.partitionBy(by).orderBy(F.desc("priority"), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def zorder_key(
    df: DataFrame,
    cols: "list[str]",
    bits: int = 16,
    key_col: str = "zkey",
) -> DataFrame:
    """Append a Z-order (Morton) key over integer dimension columns —
    the bit-interleaved sort key `optimize_layout`'s docstring points
    at: clustering on ``zkey`` gives every output file a narrow band in
    EVERY dimension at once, so stats-based file skipping works for
    predicates on any single dimension or any combination (table-format
    OPTIMIZE ZORDER BY).

    Each dimension is min/max-scaled onto [0, 2^bits) (the per-dim
    min/max is one tiny aggregate riding a one-row broadcast — the same
    corpus-scalar pattern as tf-idf), floored to an integer, and the
    dimensions' bits are interleaved LSB-first (dimension i contributes
    bit b to key bit ``b * ndims + i``).  Everything after the scaling
    divide is integer arithmetic, so the key replays exactly in any
    engine; the divide itself is one double multiply-then-divide in a
    fixed shape.  Constant dimensions (min == max) collapse to 0.

    Timestamps should be pre-cast to integers (``F.unix_micros``);
    ``bits * len(cols)`` must fit in a signed 64-bit key (<= 62).

    NULL dimension values scale to 0 (the dimension minimum) rather
    than nulling the whole key — a NULL-heavy column at 100 TB would
    otherwise collapse every affected row into a NULL sort key and
    defeat the clustering for the OTHER dimensions too.
    """
    if not cols:
        raise ValueError("need at least one dimension column")
    if bits < 1 or bits * len(cols) > 62:
        raise ValueError(
            f"bits * ndims must be in [1, 62], got {bits} * {len(cols)}"
        )
    top = float((1 << bits) - 1)
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    bounds = df.agg(*aggs)
    out = df.join(F.broadcast(bounds))
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn = F.col(f"__mn_{c}").cast("double")
        span = F.col(f"__mx_{c}").cast("double") - mn
        z = F.when(span > 0, F.coalesce(F.floor(
            (F.col(c).cast("double") - mn) * F.lit(top) / span
        ), F.lit(0))).otherwise(F.lit(0)).cast("long")
        zc = f"__z_{c}"
        out = out.withColumn(zc, z)
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(F.col(zc), b).bitwiseAND(F.lit(1)),
                    b * len(cols) + i,
                )
            )
    return (
        out.withColumn(key_col, key.cast("long"))
        .drop(*[f"__z_{c}" for c in cols])
        .drop(*[f"__mn_{c}" for c in cols])
        .drop(*[f"__mx_{c}" for c in cols])
    )


def assign_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "",
    ordered: bool = True,
) -> DataFrame:
    """Deterministic shard assignment + within-shard shuffle order for
    training-data export: every row gets ``shard`` (0..n_shards-1) and,
    when ``ordered``, ``shard_pos`` (1-based position in the shard's
    write order).

    Training loaders want data both SHARDED (so 1000 readers stream
    1000 files) and SHUFFLED (so batch i is decorrelated from batch
    i+1), and they want the same bytes on every re-run — so both the
    shard and the order come from md5(seed || ':' || id), never from
    partition layout or arrival order.  Changing ``seed`` produces an
    independent reshuffle; retries and AQE re-plans cannot.

    Scale shape: the shard id is a pure row expression (hash mod — no
    shuffle at all when ``ordered=False``, e.g. when the writer just
    needs partitionBy(shard)).  The position rank is one window per
    shard ordered by the hash: with n_shards sized so a shard fits an
    executor (the usual 10k-shards-for-100TB layout), each sort is
    local to its shard partition — this is exactly the shuffle the
    export itself requires, not an extra one.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = F.md5(F.concat(F.lit(str(seed)), F.lit(":"),
                       F.col(id_col).cast("string")))
    # shard from hex chars 9-12, order from the full hash: disjoint
    # digits, so shard and position are independent draws
    shard = (
        F.conv(F.substring(h, 9, 4), 16, 10).cast("long")
        % F.lit(int(n_shards))
    ).cast("int")
    out = df.withColumn("shard_key", h).withColumn("shard", shard)
    if not ordered:
        return out
    w = Window.partitionBy("shard").orderBy("shard_key", id_col)
    return out.withColumn("shard_pos", F.row_number().over(w))
