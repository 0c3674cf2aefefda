"""SPARQL 1.1 UPDATE subset over the ``(subj, pred, obj)`` triple table.

The reference pipeline is write-once (generate → export.py serializes),
but the published ClaimsKG lives behind a SPARQL endpoint, and a
maintained KG needs the other half of the protocol: SPARQL UPDATE
(corrections, retractions, enrichment).  This module gives the graph
the update face the query face in :mod:`operators.sparql` already has,
compiled onto the same plan machinery:

* :func:`parse_update` — recursive-descent parser (reusing the query
  module's tokenizer, prefix handling and pattern grammar) for::

      update := prefix* ( INSERT DATA qblock
                        | DELETE DATA qblock
                        | DELETE WHERE qblock
                        | DELETE qblock INSERT qblock WHERE group
                        | DELETE qblock WHERE group
                        | INSERT qblock WHERE group )
      qblock := '{' ( term term term '.'? )* '}'

  ``DATA`` blocks must be ground (no variables).  Templates are plain
  triples (no property paths); template variables must be bound by the
  WHERE group.  ``WITH`` / ``USING`` / ``GRAPH`` (named-graph-scoped
  updates), ``LOAD``/``CLEAR``/``DROP``/``CREATE``/``COPY``/``MOVE``/
  ``ADD`` and update sequences (``;``) are rejected loudly — a request
  either compiles onto this plan shape or errors (the query module's
  misplanning-is-impossible contract).

* :func:`apply_update` — pure graph → graph function with SPARQL set
  semantics ``(G ∖ D) ∪ I``:  the WHERE group binds once (the same
  ``_bindings`` chain the query faces use, so it inherits literal
  pushdown and cost-ordered joins), each template instantiates as one
  narrow projection of the binding frame (the CONSTRUCT shape), and
  the graph algebra is two anti-joins — ``kept = G ⟕̸ D`` and
  ``new = I ⟕̸ kept`` — then ``kept ∪ new``.  D and I are
  bindings-derived (usually ≪ G, broadcast right sides), so the big
  side is NEVER shuffled; physically the ``kept`` subtree feeds both
  union branches (Spark shares no subtrees), so G is scanned twice —
  two broadcast anti-join scans of the graph, zero repartitions of it
  (plan pinned by test).  The input graph is
  assumed to be a set (the RDF contract every sink in this repo
  enforces); the result is then a set by construction, with no global
  ``distinct`` over G.

* :func:`apply_update_to_table` — the transactional face over
  :class:`sources.snapshot_table.SnapshotTable`: an **insert-only**
  update (INSERT DATA / INSERT..WHERE) commits just the genuinely-new
  triples as an atomic APPEND (no table rewrite — the cheap path a
  monotone KG feed should stay on); any update with a delete side
  commits the full ``(G ∖ D) ∪ I`` as an atomic OVERWRITE.  Either
  way a reader sees the pre-update graph until the manifest pointer
  advances, and time travel keeps the pre-update snapshot addressable.
  The table may carry the ``okind`` sidecar (the code-KG product
  layout): deletes match on ``(subj, pred, obj)`` alone, and inserted
  rows are typed from the update text's own term kinds (``<iri>`` →
  ``'uri'``, ``"literal"``/number → ``''``) — a variable insert-object
  is rejected loudly on okind tables (its kind is not tracked through
  the binding join, and guessing from the value's shape could corrupt
  the N-Triples rendering).  Matching is STRING-TYPED on
  ``(subj, pred, obj)`` throughout — the engine-wide convention every
  query face shares — so ``<x>`` and ``"x"`` are the SAME triple to
  deletes and insert-dedup even though RDF would distinguish them;
  a corpus that genuinely needs both spellings of one object string
  is outside this model.
  (A production copy-on-write rewrite of only the touched files — or
  merge-on-read delete files — is the 100 TB refinement; the snapshot
  table's predicate ``delete`` covers the former for single-column
  predicates, and the OVERWRITE here is the honest general fallback.)

Reference parity: the reference has no update path (its graph is
rebuilt per release — claimskg/generator/__init__.py builds the rdflib
graph in one pass); this face is the maintenance operation a served
ClaimsKG needs between releases.
"""
from __future__ import annotations

from dataclasses import dataclass, field
import re
from functools import reduce
from typing import Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.sparql import (
    ParsedQuery,
    SparqlSyntaxError,
    Triple,
    _bindings,
    _Parser,
)

_UPDATE_UNSUPPORTED = {
    "WITH", "USING", "GRAPH", "LOAD", "CLEAR", "DROP", "CREATE",
    "COPY", "MOVE", "ADD", "SERVICE",
}


@dataclass
class ParsedUpdate:
    """One parsed update request.  ``form`` is ``insert_data`` /
    ``delete_data`` / ``delete_where`` / ``modify``; DATA forms carry
    ground triples in the matching template and ``where is None``.
    ``insert_okinds`` records each insert-template OBJECT's term kind
    as written (``'uri'`` for ``<iri>``/pname/``a``, ``''`` for
    string/number literals, ``None`` for a variable) — what an
    okind-carrying triple table needs to type inserted rows."""
    form: str
    delete_template: List[Triple] = field(default_factory=list)
    insert_template: List[Triple] = field(default_factory=list)
    insert_okinds: List[Optional[str]] = field(default_factory=list)
    where: Optional[ParsedQuery] = None
    prefixes: Dict[str, str] = field(default_factory=dict)


class _UpdateParser(_Parser):
    """The update grammar on the query module's token machinery."""

    def _plain_block(self) -> Tuple[List[Triple], List[Optional[str]]]:
        # '{' (term term term '.'?)* '}' — plain triples only: no
        # property paths (a path in a template has no instantiation).
        # Also records each OBJECT's written term kind: 'uri' for
        # <iri>/pname/a, '' for string/number literals, None for ?var.
        self.expect("{")
        trips: List[Triple] = []
        okinds: List[Optional[str]] = []
        while self.peek() != "}":
            if self.peek() is not None \
                    and self.peek().upper() in _UPDATE_UNSUPPORTED:
                raise SparqlSyntaxError(
                    f"{self.peek().upper()} is outside the supported "
                    "UPDATE subset (updates address the default graph)")
            s = self._term()
            if self.peek() == "^":
                raise SparqlSyntaxError(
                    "property paths are not allowed in update "
                    "templates or DATA blocks")
            p = self._term()
            if self.peek() in ("/", "|", "+", "*", "?"):
                raise SparqlSyntaxError(
                    "property paths are not allowed in update "
                    "templates or DATA blocks")
            raw = self.peek()
            o = self._term()
            if raw.startswith("?"):
                okinds.append(None)
            elif (raw.startswith('"')
                    or re.fullmatch(r"\d+(?:\.\d+)?", raw)):
                okinds.append("")
            else:                       # <iri>, pfx:local, a
                okinds.append("uri")
            trips.append((s, p, o))
            if self.peek() == ".":
                self.next()
        self.expect("}")
        if not trips:
            raise SparqlSyntaxError("empty triple block in update")
        return trips, okinds

    @staticmethod
    def _require_ground(trips: List[Triple], what: str) -> None:
        bad = sorted({t for tr in trips for t in tr if t.startswith("?")})
        if bad:
            raise SparqlSyntaxError(
                f"{what} blocks must be ground (no variables): {bad}")

    def _where_group(self) -> ParsedQuery:
        q = ParsedQuery(form="select")
        self._group(q)
        return q

    def parse_update(self) -> ParsedUpdate:
        while self.at_kw("PREFIX"):
            self.next()
            name = self.next()
            if name.endswith(":"):
                name = name[:-1]
            else:
                self.expect(":")
            iri = self.next()
            if not (iri.startswith("<") and iri.endswith(">")):
                raise SparqlSyntaxError(f"PREFIX IRI must be <...>: {iri!r}")
            self.prefixes[name] = iri[1:-1]
        t = self.peek()
        if t is not None and t.upper() in _UPDATE_UNSUPPORTED:
            raise SparqlSyntaxError(
                f"{t.upper()} is outside the supported UPDATE subset")
        if self.at_kw("INSERT"):
            self.next()
            if self.at_kw("DATA"):
                self.next()
                trips, oks = self._plain_block()
                self._require_ground(trips, "INSERT DATA")
                u = ParsedUpdate(form="insert_data", insert_template=trips,
                                 insert_okinds=oks)
            else:
                tmpl, oks = self._plain_block()
                self.kw("WHERE")
                u = ParsedUpdate(form="modify", insert_template=tmpl,
                                 insert_okinds=oks,
                                 where=self._where_group())
        elif self.at_kw("DELETE"):
            self.next()
            if self.at_kw("DATA"):
                self.next()
                trips, _ = self._plain_block()
                self._require_ground(trips, "DELETE DATA")
                u = ParsedUpdate(form="delete_data", delete_template=trips)
            elif self.at_kw("WHERE"):
                # DELETE WHERE { ... }: the pattern is its own template;
                # a fully-ground pattern degenerates to DELETE DATA
                # (bgp_query rejects variable-free patterns by design)
                self.next()
                tmpl, _ = self._plain_block()
                if not any(t.startswith("?") for tr in tmpl for t in tr):
                    u = ParsedUpdate(form="delete_data",
                                     delete_template=tmpl)
                elif any(not any(t.startswith("?") for t in tr)
                         for tr in tmpl):
                    raise SparqlSyntaxError(
                        "DELETE WHERE mixing ground and variable "
                        "patterns is outside the subset — split into "
                        "DELETE DATA + DELETE WHERE")
                else:
                    u = ParsedUpdate(
                        form="delete_where", delete_template=tmpl,
                        where=ParsedQuery(form="select",
                                          patterns=list(tmpl)))
            else:
                dt, _ = self._plain_block()
                it: List[Triple] = []
                oks: List[Optional[str]] = []
                if self.at_kw("INSERT"):
                    self.next()
                    it, oks = self._plain_block()
                self.kw("WHERE")
                u = ParsedUpdate(form="modify", delete_template=dt,
                                 insert_template=it, insert_okinds=oks,
                                 where=self._where_group())
        else:
            raise SparqlSyntaxError(
                f"expected INSERT or DELETE, got {t!r}")
        if self.peek() == ";":
            raise SparqlSyntaxError(
                "update sequences (';') are outside the subset — apply "
                "updates one at a time (each is one atomic commit)")
        if self.i < len(self.toks):
            raise SparqlSyntaxError(
                f"trailing tokens after update: {self.toks[self.i:]!r}")
        u.prefixes = self.prefixes
        return u


def parse_update(text: str) -> ParsedUpdate:
    """Parse one SPARQL UPDATE request in the subset (module grammar)."""
    return _UpdateParser(text).parse_update()


def _literal_rel(graph: DataFrame, trips: List[Triple],
                 okinds: Optional[List[Optional[str]]] = None
                 ) -> DataFrame:
    if okinds is None:
        return graph.sparkSession.createDataFrame(
            sorted(set(trips)), "subj string, pred string, obj string")
    rows = sorted({(s, p, o, k)
                   for (s, p, o), k in zip(trips, okinds)})
    return graph.sparkSession.createDataFrame(
        rows, "subj string, pred string, obj string, okind string")


def _instantiate(bindings: DataFrame, template: List[Triple],
                 what: str,
                 okinds: Optional[List[Optional[str]]] = None
                 ) -> DataFrame:
    """Template × solutions → distinct triple set (the CONSTRUCT
    projection shape: one narrow select per template pattern)."""
    bound = set(bindings.columns)

    def term_col(term: str, pos: str) -> Column:
        if term.startswith("?"):
            v = term[1:]
            if v not in bound:
                raise SparqlSyntaxError(
                    f"{what} template variable ?{v} is not bound by "
                    "the WHERE group")
            return F.col(v).alias(pos)
        return F.lit(term).alias(pos)

    parts = []
    for i, (s, p, o) in enumerate(template):
        cols = [term_col(s, "subj"), term_col(p, "pred"),
                term_col(o, "obj")]
        if okinds is not None:
            # okind-carrying table: the inserted row's term kind must
            # be known at parse time — a variable object's kind is not
            # tracked through the binding join, so reject loudly
            # rather than guess from the value's shape
            if okinds[i] is None:
                raise SparqlSyntaxError(
                    f"{what} template object {o!r} is a variable — an "
                    "okind-carrying table needs an explicit <iri> or "
                    '"literal" object (or project okind off and '
                    "update the plain triple view)")
            cols.append(F.lit(okinds[i]).alias("okind"))
        parts.append(bindings.select(*cols))
    return reduce(DataFrame.unionAll, parts).distinct()


_KEYS = ["subj", "pred", "obj"]


def _delta(graph: DataFrame, u: ParsedUpdate,
           stats: Optional[dict] = None,
           charsets: Optional[dict] = None,
           with_okind: bool = False
           ) -> Tuple[Optional[DataFrame], Optional[DataFrame]]:
    """(delete set, insert set) for one parsed update — each a distinct
    triple frame or None.  Pattern forms bind the WHERE group ONCE and
    instantiate both templates from the same frame.  ``with_okind``
    types the INSERT side from the parse-time term kinds (the delete
    side matches on (subj, pred, obj) alone and never needs it)."""
    ioks = u.insert_okinds if with_okind else None
    if u.form == "insert_data":
        return None, _literal_rel(graph, u.insert_template, ioks)
    if u.form == "delete_data":
        return _literal_rel(graph, u.delete_template), None
    b = _bindings(graph, u.where, stats, 8, charsets)
    dels = (_instantiate(b, u.delete_template, "DELETE")
            if u.delete_template else None)
    ins = (_instantiate(b, u.insert_template, "INSERT", okinds=ioks)
           if u.insert_template else None)
    return dels, ins


def apply_update(graph: DataFrame, update: str,
                 stats: Optional[dict] = None,
                 charsets: Optional[dict] = None) -> DataFrame:
    """Apply one SPARQL UPDATE request to a set-semantics triple frame
    and return the new graph ``(G ∖ D) ∪ I`` (module docstring: two
    anti-joins, G never shuffled)."""
    u = update if isinstance(update, ParsedUpdate) else parse_update(update)
    if sorted(graph.columns) != sorted(_KEYS):
        raise ValueError(
            "apply_update needs a plain (subj, pred, obj) set graph — "
            f"got columns {graph.columns}; project away extras (an "
            "update cannot synthesize sidecar columns for inserted "
            "rows, and GRAPH-scoped updates are outside the subset)")
    dels, ins = _delta(graph, u, stats, charsets)
    kept = graph if dels is None else graph.join(dels, _KEYS, "left_anti")
    if ins is None:
        return kept
    return kept.unionAll(ins.join(kept, _KEYS, "left_anti"))


def update_delta(graph: DataFrame, update: str,
                 stats: Optional[dict] = None,
                 charsets: Optional[dict] = None
                 ) -> Tuple[Optional[DataFrame], Optional[DataFrame]]:
    """The update's EFFECTIVE ``(deletes, inserts)`` against the
    current graph — the exact triple delta incremental maintenance
    consumes (``kg_stats.charset_apply``, the VoID/rollup monoid
    merges, diff-driven refresh).  Raw template deletes of absent
    triples and raw inserts of already-present triples are filtered
    out (``D ∩ G`` and ``I ∖ (G ∖ D)``), so replaying this delta on
    any derived state equals rebuilding that state over
    :func:`apply_update`'s result — a triple deleted and re-inserted
    by the same request appears on BOTH sides (net zero, exactly what
    an additive state needs).  Either side is None when the request
    has no such template."""
    u = update if isinstance(update, ParsedUpdate) else parse_update(update)
    if sorted(graph.columns) != sorted(_KEYS):
        raise ValueError(
            "update_delta needs a plain (subj, pred, obj) set graph — "
            f"got columns {graph.columns}")
    dels, ins = _delta(graph, u, stats, charsets)
    eff_d = (None if dels is None
             else dels.join(graph, _KEYS, "left_semi"))
    kept = graph if dels is None else graph.join(dels, _KEYS, "left_anti")
    eff_i = (None if ins is None
             else ins.join(kept, _KEYS, "left_anti"))
    return eff_d, eff_i


def apply_update_to_table(table, update: str,
                          stats: Optional[dict] = None,
                          charsets: Optional[dict] = None) -> int:
    """Apply one update request to a :class:`SnapshotTable` of triples
    as ONE atomic commit; returns the new snapshot id.  Insert-only
    updates append just the genuinely-new triples (no rewrite); a
    delete side falls back to an atomic overwrite of ``(G ∖ D) ∪ I``
    (module docstring: the honest general path — copy-on-write of only
    the touched files is the production refinement)."""
    u = update if isinstance(update, ParsedUpdate) else parse_update(update)
    current = table.read()
    has_okind = sorted(current.columns) == sorted(_KEYS + ["okind"])
    if not has_okind and sorted(current.columns) != sorted(_KEYS):
        raise ValueError(
            "apply_update_to_table needs a (subj, pred, obj[, okind]) "
            f"triple table — got columns {current.columns}")
    dels, ins = _delta(current, u, stats, charsets,
                       with_okind=has_okind)
    if dels is None:
        new_rows = (ins.join(current, _KEYS, "left_anti")
                    .select(*current.columns))
        return table.append(new_rows,
                            extra={"sparql_update": u.form})
    kept = current.join(dels.select(*_KEYS), _KEYS, "left_anti")
    result = kept if ins is None \
        else kept.unionByName(ins.join(kept, _KEYS, "left_anti"))
    return table.overwrite(result.select(*current.columns))
