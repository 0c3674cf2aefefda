"""SPARQL-subset front end (operators/sparql.py): parser, SELECT /
CONSTRUCT compilation onto bgp_query, FILTER expressions, aggregates,
solution modifiers, and the path_closure property-path operator.  The
q106-q109 value paths are pinned by the driver oracles."""

import pytest
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.sparql import (
    RDF_TYPE,
    SparqlSyntaxError,
    edges_from_triples,
    parse_sparql,
    path_closure,
    sparql_construct,
    sparql_select,
)

SCHEMA = "subj string, pred string, obj string, okind string"


@pytest.fixture(scope="module")
def g(spark):
    rows = [
        ("f1", "imports", "m1", "uri"),
        ("f1", "imports", "m2", "uri"),
        ("f2", "imports", "m1", "uri"),
        ("f3", "imports", "m2", "uri"),
        ("m1", "label", "numpy", ""),
        ("m2", "label", "requests", ""),
        ("f1", "lang", "python", ""),
        ("f2", "lang", "go", ""),
        ("f3", "lang", "python", ""),
        ("f1", RDF_TYPE, "File", "uri"),
        ("f2", RDF_TYPE, "File", "uri"),
        ("f1", "stars", "10", ""),
        ("f2", "stars", "3", ""),
        ("f3", "stars", "25", ""),
    ]
    return spark.createDataFrame(rows, SCHEMA)


# ---------------------------------------------------------------- parser

def test_parse_prefixes_and_terms():
    q = parse_sparql("""
        PREFIX ex: <http://ex.org/>
        SELECT ?f WHERE { ?f ex:imports "m1" . ?f a ex:File }
    """)
    assert q.form == "select"
    assert q.patterns == [
        ("?f", "http://ex.org/imports", "m1"),
        ("?f", RDF_TYPE, "http://ex.org/File"),
    ]
    assert [i.var for i in q.select] == ["f"]


def test_parse_string_escapes_and_numbers():
    q = parse_sparql(r'SELECT ?x WHERE { ?x <p> "a\"b\nc" . ?x <q> 3.5 }')
    assert q.patterns[0][2] == 'a"b\nc'
    assert q.patterns[1][2] == "3.5"


def test_parse_comments_ignored():
    q = parse_sparql(
        "SELECT ?x WHERE { # a comment\n ?x <p> ?y }  # trailing")
    assert q.patterns == [("?x", "p", "?y")]


def test_parse_solution_modifiers():
    q = parse_sparql("""
        SELECT DISTINCT ?a ?b WHERE { ?a <p> ?b }
        ORDER BY DESC(?b) ?a LIMIT 7 OFFSET 2
    """)
    assert q.distinct and q.limit == 7 and q.offset == 2
    assert q.order_by == [("b", False), ("a", True)]


def test_parse_group_structure():
    q = parse_sparql("""
        SELECT ?a WHERE {
          ?a <p> ?b .
          OPTIONAL { ?b <q> ?c }
          FILTER NOT EXISTS { ?a <bad> ?z }
          FILTER (?b != "x" && CONTAINS(?b, "y"))
        }
    """)
    assert q.optional_groups == [[("?b", "q", "?c")]]
    assert q.not_exists_groups == [[("?a", "bad", "?z")]]
    assert len(q.filters) == 1 and q.filters[0][0] == "and"


@pytest.mark.parametrize("bad, msg", [
    ("SELECT ?x WHERE { SERVICE <g> { ?x <p> ?y } }", "SERVICE"),
    ("SELECT ?x WHERE { SERVICE <s> { ?x <p> ?y } }", "SERVICE"),
    ("SELECT ?x WHERE { ?x pfx:zzz ?y }", "unknown prefix"),
    ("SELECT WHERE { ?x <p> ?y }", "empty SELECT"),
    ("SELECT ?x WHERE { }", "no required patterns"),
    ("SELECT ?x WHERE { ?x <p> }", "cannot read term"),
    ("SELECT (SUM(*) AS ?s) WHERE { ?x <p> ?y }", "not a thing"),
    ("SELECT ?x WHERE { ?x <p> ?y } LIMIT ?x", "integer"),
    ("SELECT ?x WHERE { ?x <p> ?y } GROUP BY", "GROUP BY"),
])
def test_parse_errors(bad, msg):
    with pytest.raises(SparqlSyntaxError, match=msg):
        parse_sparql(bad)


# ---------------------------------------------------------------- SELECT

def test_select_matches_programmatic_bgp(g):
    from claimskg_generator_spark.operators.bgp import bgp_query

    text = sparql_select(g, """
        SELECT ?f ?l WHERE { ?f <imports> ?m . ?m <label> ?l }
    """)
    prog = bgp_query(g, [("?f", "imports", "?m"), ("?m", "label", "?l")],
                     select=["?f", "?l"])
    assert sorted(map(tuple, text.collect())) == \
        sorted(map(tuple, prog.collect()))


def test_select_star_and_filter(g):
    out = sparql_select(g, """
        SELECT * WHERE {
          ?f <imports> ?m . ?f <lang> ?lg
          FILTER (?lg = "python" && ?m != "m2")
        }
    """)
    assert out.columns == ["f", "lg", "m"]
    assert {tuple(r) for r in out.collect()} == {("f1", "python", "m1")}


def test_filter_or_and_functions(g):
    out = sparql_select(g, """
        SELECT ?m ?l WHERE {
          ?f <imports> ?m . ?m <label> ?l
          FILTER (STRSTARTS(?l, "num") || REGEX(?l, "^req.*s$"))
        }
    """)
    assert {r["l"] for r in out.collect()} == {"numpy", "requests"}


def test_filter_comparison_is_string_typed(g):
    # "3" > "10" lexicographically — the documented string semantics
    out = sparql_select(
        g, 'SELECT ?f WHERE { ?f <stars> ?s FILTER (?s > "10") }')
    assert {r["f"] for r in out.collect()} == {"f2", "f3"}


def test_filter_on_unselected_var(g):
    out = sparql_select(g, """
        SELECT ?m WHERE { ?f <imports> ?m . ?f <lang> ?lg
                          FILTER (?lg = "go") }
    """)
    assert [r["m"] for r in out.collect()] == ["m1"]


def test_optional_and_not_exists_through_text(g):
    out = sparql_select(g, """
        SELECT ?f ?t WHERE {
          ?f <imports> ?m .
          OPTIONAL { ?f a ?t }
          FILTER NOT EXISTS { ?f <lang> "go" }
        }
    """).distinct()
    got = {(r["f"], r["t"]) for r in out.collect()}
    assert got == {("f1", "File"), ("f3", None)}


def test_filter_exists_through_text(g):
    # files that import anything AND declare a language; ?l stays
    # inside the EXISTS group (binds nothing new)
    out = sparql_select(g, """
        SELECT DISTINCT ?f WHERE {
          ?f <imports> ?m .
          FILTER EXISTS { ?f <lang> ?l }
        }
    """)
    assert out.columns == ["f"]
    assert {r["f"] for r in out.collect()} == {"f1", "f2", "f3"}
    # a literal narrows the group
    out2 = sparql_select(g, """
        SELECT DISTINCT ?f WHERE {
          ?f <imports> ?m .
          FILTER EXISTS { ?f <lang> "python" }
        }
    """)
    assert {r["f"] for r in out2.collect()} == {"f1", "f3"}


def test_filter_exists_parses_alongside_not_exists():
    q = parse_sparql("""
        SELECT ?a WHERE {
          ?a <p> ?b .
          FILTER EXISTS { ?a <good> ?z }
          FILTER NOT EXISTS { ?a <bad> ?z }
        }
    """)
    assert q.exists_groups == [[("?a", "good", "?z")]]
    assert q.not_exists_groups == [[("?a", "bad", "?z")]]


def test_star_path_zero_or_more(spark):
    t = spark.createDataFrame(
        [("a", "dep", "b", ""), ("b", "dep", "c", ""),
         ("x", "lbl", "X", "")], SCHEMA)
    out = sparql_select(t, "SELECT ?s ?o WHERE { ?s <dep>* ?o }")
    got = sorted((r["s"], r["o"]) for r in out.collect())
    # closure pairs plus one zero-length row per graph TERM (subjects
    # and objects both; X is an object-only term)
    assert got == sorted(
        [("a", "b"), ("a", "c"), ("b", "c")]
        + [(v, v) for v in ["a", "b", "c", "x", "X"]])
    # literal endpoint: zero-length matches the constant itself even
    # when absent from the graph (SPARQL 1.1 §18.4 ZeroLengthPath)
    out2 = sparql_select(t, "SELECT ?s WHERE { ?s <dep>* <c> }")
    assert sorted(r["s"] for r in out2.collect()) == ["a", "b", "c"]
    out3 = sparql_select(t, "SELECT ?s WHERE { ?s <dep>* <zz> }")
    assert [r["s"] for r in out3.collect()] == ["zz"]
    # ?a p* ?a — every graph term reaches itself in zero hops
    out4 = sparql_select(t, "SELECT ?a WHERE { ?a <dep>* ?a }")
    assert sorted(r["a"] for r in out4.collect()) == \
        ["X", "a", "b", "c", "x"]


def test_opt_path_zero_or_one(spark):
    t = spark.createDataFrame(
        [("a", "dep", "b", ""), ("b", "dep", "c", "")], SCHEMA)
    out = sparql_select(t, "SELECT ?s ?o WHERE { ?s <dep>? ?o }")
    got = sorted((r["s"], r["o"]) for r in out.collect())
    # one-hop sliver + zero rows, but NO two-hop (a, c)
    assert got == sorted(
        [("a", "b"), ("b", "c")]
        + [(v, v) for v in ["a", "b", "c"]])


def test_path_modifier_rejections():
    for bad, msg in [
        ("SELECT ?s WHERE { ?s <p>/<q>* ?o }",
         "sequence-path elements"),
        ("SELECT ?s WHERE { ?s <p>|<q>? ?o }", "single predicate"),
        ("SELECT ?s WHERE { ?s <p>*+ ?o }", "composes with no other"),
        ("SELECT ?s WHERE { <a> <p>* <b> }", "variable endpoint"),
        ("SELECT ?s WHERE { ?s ?p* ?o }", "not variables"),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            parse_sparql(bad)


def test_inverse_star_path(spark):
    t = spark.createDataFrame(
        [("a", "dep", "b", ""), ("b", "dep", "c", "")], SCHEMA)
    # ^dep* from c: ancestors of c plus c itself
    out = sparql_select(t, "SELECT ?s WHERE { <c> ^<dep>* ?s }")
    assert sorted(r["s"] for r in out.collect()) == ["a", "b", "c"]


def test_filter_exists_with_union_slow_path(g):
    # UNION forces the non-fast compile path; EXISTS still semi-joins
    out = sparql_select(g, """
        SELECT DISTINCT ?f WHERE {
          { ?f <lang> "python" } UNION { ?f <lang> "go" }
          FILTER EXISTS { ?f <imports> "m1" }
        }
    """)
    assert {r["f"] for r in out.collect()} == {"f1", "f2"}


def test_distinct_order_limit_offset(g):
    out = sparql_select(g, """
        SELECT DISTINCT ?m WHERE { ?f <imports> ?m }
        ORDER BY DESC(?m) LIMIT 1 OFFSET 1
    """)
    assert [r["m"] for r in out.collect()] == ["m1"]


def test_aggregates(g):
    out = sparql_select(g, """
        SELECT ?lg (COUNT(*) AS ?n) (COUNT(DISTINCT ?m) AS ?nm)
               (MIN(?m) AS ?first) (SUM(?s) AS ?stars)
        WHERE { ?f <imports> ?m . ?f <lang> ?lg . ?f <stars> ?s }
        GROUP BY ?lg
    """)
    rows = {r["lg"]: r for r in out.collect()}
    assert out.columns == ["lg", "n", "nm", "first", "stars"]
    # python: f1 imports m1+m2 (10 stars each binding), f3 imports m2 (25)
    assert rows["python"]["n"] == 3
    assert rows["python"]["nm"] == 2
    assert rows["python"]["first"] == "m1"
    assert rows["python"]["stars"] == pytest.approx(45.0)
    assert rows["go"]["n"] == 1


def test_agg_errors(g):
    with pytest.raises(SparqlSyntaxError, match="must be grouped"):
        sparql_select(g, """
            SELECT ?f (COUNT(*) AS ?n) WHERE { ?f <imports> ?m }
            GROUP BY ?m
        """)
    with pytest.raises(SparqlSyntaxError, match="without any aggregate"):
        sparql_select(
            g, "SELECT ?m WHERE { ?f <imports> ?m } GROUP BY ?m")
    with pytest.raises(SparqlSyntaxError, match="unbound"):
        sparql_select(
            g, 'SELECT ?zzz WHERE { ?f <imports> ?m }')
    with pytest.raises(SparqlSyntaxError, match="unbound"):
        sparql_select(
            g, 'SELECT ?m WHERE { ?f <imports> ?m FILTER (?nope = "x") }')


def test_select_on_construct_rejected(g):
    with pytest.raises(ValueError, match="not a SELECT"):
        sparql_select(g, "CONSTRUCT { ?f <p> ?m } WHERE { ?f <imports> ?m }")


# ----------------------------------------------------------- UNION/VALUES

def test_union_basic_bag_semantics(g):
    out = sparql_select(g, """
        SELECT ?f WHERE {
          { ?f <lang> "python" } UNION { ?f <imports> "m1" }
        }
    """)
    got = sorted(r["f"] for r in out.collect())
    # f1 matches BOTH branches -> appears twice (bag semantics)
    assert got == ["f1", "f1", "f2", "f3"]


def test_union_joins_with_required_patterns(g):
    out = sparql_select(g, """
        SELECT ?f ?m WHERE {
          ?f <imports> ?m .
          { ?f <lang> "go" } UNION { ?f <lang> "python" . ?f <stars> "25" }
        }
    """)
    got = {(r["f"], r["m"]) for r in out.collect()}
    assert got == {("f2", "m1"), ("f3", "m2")}


def test_union_three_branches_and_values(g):
    out = sparql_select(g, """
        SELECT DISTINCT ?f WHERE {
          { ?f <lang> "go" } UNION { ?f <lang> "python" }
            UNION { ?f <stars> "25" }
          VALUES ?f { "f2" "f3" "zzz" }
        }
    """)
    assert {r["f"] for r in out.collect()} == {"f2", "f3"}


def test_values_multi_var_binds_new_variable(g):
    out = sparql_select(g, """
        SELECT ?f ?tier WHERE {
          ?f <lang> ?lg .
          VALUES (?lg ?tier) { ("python" "hot") ("go" "cold") }
        }
    """)
    got = {(r["f"], r["tier"]) for r in out.collect()}
    assert got == {("f1", "hot"), ("f3", "hot"), ("f2", "cold")}


def test_values_broadcast_plan(g):
    df = sparql_select(g, """
        SELECT ?f WHERE { ?f <lang> ?lg . VALUES ?lg { "python" } }
    """)
    jvm = df.sparkSession.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in plan


def test_union_mismatched_branch_vars_rejected(g):
    with pytest.raises(SparqlSyntaxError, match="identical variable"):
        sparql_select(g, """
            SELECT ?f WHERE {
              { ?f <lang> "go" } UNION { ?f <imports> ?m }
            }
        """)


def test_union_values_cartesian_rejected(g):
    with pytest.raises(SparqlSyntaxError, match="cartesian"):
        sparql_select(g, """
            SELECT ?f WHERE {
              ?f <lang> "go" .
              { ?x <imports> "m1" } UNION { ?x <imports> "m2" }
            }
        """)
    with pytest.raises(SparqlSyntaxError, match="cartesian"):
        sparql_select(
            g, 'SELECT ?f WHERE { ?f <lang> "go" . VALUES ?z { "a" } }')


@pytest.mark.parametrize("bad, msg", [
    ("SELECT ?f WHERE { { ?f <p> ?x } }", "UNION chain"),
    ("SELECT ?f WHERE { VALUES ?f { UNDEF } . ?f <p> ?x }", "UNDEF"),
    ("SELECT ?f WHERE { VALUES ?f { ?g } . ?f <p> ?x }", "literal"),
    ("SELECT ?f WHERE { VALUES ?f { } . ?f <p> ?x }", ">= 1 row"),
    ("SELECT ?f WHERE { VALUES (?f ?f) { (\"a\" \"b\") } . ?f <p> ?x }",
     "duplicate VALUES"),
    ("SELECT ?f WHERE { VALUES <iri> { \"a\" } . ?f <p> ?x }",
     "must be a .var"),
])
def test_union_values_parse_errors(bad, msg):
    with pytest.raises(SparqlSyntaxError, match=msg):
        parse_sparql(bad)


# ------------------------------------------------------------- CONSTRUCT

def test_construct_set_semantics(g):
    out = sparql_construct(g, """
        CONSTRUCT { ?lg <usedBy> ?f . ?f <usesLang> ?lg }
        WHERE { ?f <imports> ?m . ?f <lang> ?lg }
    """)
    assert out.columns == ["subj", "pred", "obj"]
    got = {tuple(r) for r in out.collect()}
    # f1 has TWO imports but each constructed triple appears once (set)
    assert out.count() == len(got) == 6
    assert ("python", "usedBy", "f1") in got
    assert ("f2", "usesLang", "go") in got


def test_construct_literal_template_and_unbound(g):
    out = sparql_construct(g, """
        CONSTRUCT { ?f a <Importer> } WHERE { ?f <imports> ?m }
    """)
    got = {tuple(r) for r in out.collect()}
    assert got == {(f, RDF_TYPE, "Importer") for f in ("f1", "f2", "f3")}
    with pytest.raises(SparqlSyntaxError, match="not bound"):
        sparql_construct(
            g, "CONSTRUCT { ?f <p> ?nope } WHERE { ?f <imports> ?m }")


# ---------------------------------------------------------- path_closure

@pytest.fixture(scope="module")
def chain(spark):
    # a -> b -> c -> d   plus a 3-cycle x -> y -> z -> x
    rows = [("a", "b"), ("b", "c"), ("c", "d"),
            ("x", "y"), ("y", "z"), ("z", "x")]
    return spark.createDataFrame(rows, "src string, dst string")


def _closure_pairs(df):
    return {(r["src"], r["dst"]): r["hops"] for r in df.collect()}


def test_closure_min_hops(chain):
    got = _closure_pairs(path_closure(chain, max_hops=5))
    assert got[("a", "b")] == 1 and got[("a", "c")] == 2
    assert got[("a", "d")] == 3
    assert ("b", "a") not in got  # directed


def test_closure_cycle_terminates_and_self_reaches(chain):
    got = _closure_pairs(path_closure(chain, max_hops=10))
    # x pred+ x holds on the 3-cycle, found at its minimal length
    assert got[("x", "x")] == 3
    assert got[("x", "z")] == 2
    # cycle pairs never exceed hop 3 (every pair found at min length)
    assert max(h for (s, _), h in got.items() if s in "xyz") == 3


def test_closure_bounded_depth(chain):
    got = _closure_pairs(path_closure(chain, max_hops=2))
    assert ("a", "d") not in got
    assert got[("a", "c")] == 2


def test_closure_fixed_rounds_equals_early_stop(chain):
    a = _closure_pairs(path_closure(chain, max_hops=6, early_stop=True))
    b = _closure_pairs(path_closure(chain, max_hops=6, early_stop=False))
    assert a == b


def test_closure_vs_python_bfs(spark):
    # deterministic pseudo-random sparse digraph, checked against a
    # driver-side pairwise BFS
    import hashlib

    n = 30
    edges = []
    for u in range(n):
        for k in range(2):
            h = int(hashlib.md5(f"{u}:{k}".encode()).hexdigest(), 16)
            v = h % n
            if v != u:
                edges.append((f"n{u}", f"n{v}"))
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    expect = {}
    for s in {u for u, _ in edges}:
        frontier, seen, h = adj.get(s, set()), {}, 1
        while frontier and h <= 6:
            nxt = set()
            for v in frontier:
                if v not in seen:
                    seen[v] = h
                    nxt |= adj.get(v, set())
            frontier = {v for v in nxt if v not in seen}
            h += 1
        for d, hh in seen.items():
            expect[(s, d)] = hh
    df = spark.createDataFrame(edges, "src string, dst string")
    got = _closure_pairs(path_closure(df, max_hops=6))
    assert got == expect


def test_closure_input_validation(chain):
    with pytest.raises(ValueError, match="max_hops"):
        path_closure(chain, max_hops=0)


def test_edges_from_triples(g):
    e = edges_from_triples(g, "imports")
    assert set(map(tuple, e.collect())) == {
        ("f1", "m1"), ("f1", "m2"), ("f2", "m1"), ("f3", "m2")}
    got = _closure_pairs(path_closure(e, max_hops=3))
    assert all(h == 1 for h in got.values())  # bipartite: no 2-hop paths


def test_repo_dependencies_ownership(spark):
    from claimskg_generator_spark.operators.code_kg import repo_dependencies

    # rA imports "numpy" from 2 files, rB from 1 -> rA owns numpy;
    # tie on "flask" (1 file each) -> lexicographically smaller rA owns
    rows = [
        ("rA", "a1.py", "c", "python", "import numpy"),
        ("rA", "a2.py", "c", "python", "import numpy\nimport flask"),
        ("rB", "b1.py", "c", "python", "import numpy\nimport flask"),
    ]
    files = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    got = set(map(tuple, repo_dependencies(files).collect()))
    assert got == {("rB", "rA")}


# ----------------------------------------- paths / BIND / MINUS / HAVING

def test_sequence_path_expands_through_hidden_var(g):
    q = parse_sparql(
        "SELECT ?f ?l WHERE { ?f <imports>/<label> ?l }")
    assert q.patterns == [
        ("?f", "imports", "?__pv0"), ("?__pv0", "label", "?l")]
    got = sorted(map(tuple, sparql_select(g, q).collect()))
    assert got == [("f1", "numpy"), ("f1", "requests"),
                   ("f2", "numpy"), ("f3", "requests")]


def test_inverse_path_swaps_subject_object(g):
    inv = sparql_select(g, "SELECT ?m ?f WHERE { ?m ^<imports> ?f }")
    fwd = sparql_select(g, "SELECT ?m ?f WHERE { ?f <imports> ?m }")
    assert sorted(map(tuple, inv.collect())) == \
        sorted(map(tuple, fwd.collect()))


def test_alternation_path_is_a_union_chain(g):
    q = parse_sparql(
        'SELECT ?f ?x WHERE { ?f <lang>|<stars> ?x . ?f a <File> }')
    assert q.union_chains == [
        [[("?f", "lang", "?x")], [("?f", "stars", "?x")]]]
    got = sorted(map(tuple, sparql_select(g, q).collect()))
    assert got == [("f1", "10"), ("f1", "python"),
                   ("f2", "3"), ("f2", "go")]


def test_select_star_hides_sequence_path_vars(g):
    df = sparql_select(g, "SELECT * WHERE { ?f <imports>/<label> ?l }")
    assert df.columns == ["f", "l"]


def test_bind_concat_and_string_fns(g):
    got = dict(sparql_select(g, """
        SELECT ?m ?k WHERE {
          ?x <label> ?m . BIND(CONCAT(UCASE(?m), "!") AS ?u)
          BIND(?u AS ?k)
        }
    """).collect())
    assert got == {"numpy": "NUMPY!", "requests": "REQUESTS!"}
    lens = dict(sparql_select(g, """
        SELECT ?m ?n WHERE { ?x <label> ?m . BIND(STRLEN(?m) AS ?n) }
    """).collect())
    assert lens == {"numpy": 5, "requests": 8}


def test_bind_var_usable_in_group_by_and_filter(g):
    rows = sparql_select(g, """
        SELECT ?k (COUNT(*) AS ?n) WHERE {
          ?f <lang> ?l . BIND(UCASE(?l) AS ?k) FILTER(?k != "GO")
        } GROUP BY ?k
    """).collect()
    assert [(r["k"], r["n"]) for r in rows] == [("PYTHON", 2)]


def test_bind_errors(g):
    with pytest.raises(SparqlSyntaxError, match="already bound"):
        sparql_select(g, "SELECT ?f WHERE { ?f <lang> ?l . "
                         'BIND("x" AS ?l) }').collect()
    with pytest.raises(SparqlSyntaxError, match="unbound"):
        sparql_select(g, "SELECT ?f WHERE { ?f <lang> ?l . "
                         "BIND(?nope AS ?z) }").collect()


def test_minus_removes_on_shared_vars(g):
    got = sorted(r["f"] for r in sparql_select(g, """
        SELECT ?f WHERE { ?f <imports> ?m
                          MINUS { ?f <lang> "python" } }
    """).collect())
    assert got == ["f2"]


def test_minus_disjoint_domain_removes_nothing(g):
    # MINUS group shares NO variable -> SPARQL keeps everything
    # (NOT EXISTS over the same group would empty the result)
    kept = sparql_select(g, """
        SELECT ?f WHERE { ?f <imports> ?m MINUS { ?z <lang> "python" } }
    """).count()
    assert kept == 4


def test_having_filters_aggregates(g):
    rows = sparql_select(g, """
        SELECT ?l (COUNT(*) AS ?n) WHERE { ?f <lang> ?l . ?f <imports> ?m }
        GROUP BY ?l HAVING(?n >= 2) ORDER BY ?l
    """).collect()
    assert [(r["l"], r["n"]) for r in rows] == [("python", 3)]
    with pytest.raises(SparqlSyntaxError, match="HAVING"):
        sparql_select(g, "SELECT ?f WHERE { ?f <lang> ?l } HAVING(?l = \"x\")")
    with pytest.raises(SparqlSyntaxError, match="group keys or aggregate"):
        sparql_select(g, """
            SELECT ?l (COUNT(*) AS ?n) WHERE { ?f <lang> ?l }
            GROUP BY ?l HAVING(?zz > 1)
        """)


# --------------------------------------------------------- ASK / DESCRIBE

def test_ask_true_false_one_boolean_row(g):
    from claimskg_generator_spark.operators.sparql import sparql_ask

    t = sparql_ask(g, 'ASK { ?f <lang> "go" . ?f <imports> ?m }')
    assert [tuple(r) for r in t.collect()] == [(True,)]
    assert t.columns == ["ask"]
    f = sparql_ask(g, 'ASK { ?f <lang> "rust" }')
    assert [tuple(r) for r in f.collect()] == [(False,)]


def test_ask_plan_has_limit_early_out(g):
    from claimskg_generator_spark.operators.sparql import sparql_ask

    plan = sparql_ask(g, 'ASK { ?f <lang> "go" }')._jdf \
        .queryExecution().optimizedPlan().toString()
    assert "GlobalLimit 1" in plan or "Limit 1" in plan


def test_describe_var_and_iri_targets(g):
    from claimskg_generator_spark.operators.sparql import sparql_describe

    got = set(map(tuple, sparql_describe(g, """
        DESCRIBE ?m <f2> WHERE { ?f <imports> ?m . ?f <lang> "go" }
    """).collect()))
    # nodes: m1 (imported by go file f2) + the literal IRI f2
    assert got == {
        ("m1", "label", "numpy"),
        ("f2", "imports", "m1"), ("f2", "lang", "go"),
        ("f2", RDF_TYPE, "File"), ("f2", "stars", "3"),
    }


def test_describe_iri_only_needs_no_where(g):
    from claimskg_generator_spark.operators.sparql import sparql_describe

    got = set(map(tuple, sparql_describe(g, "DESCRIBE <m1> <m2>")
                  .collect()))
    assert got == {("m1", "label", "numpy"), ("m2", "label", "requests")}


def test_describe_unbound_var_rejected(g):
    from claimskg_generator_spark.operators.sparql import sparql_describe

    with pytest.raises(SparqlSyntaxError, match="unbound"):
        sparql_describe(g, "DESCRIBE ?zz WHERE { ?f <lang> ?l }")


def test_new_forms_dispatch_guards(g):
    from claimskg_generator_spark.operators.sparql import (
        sparql_ask, sparql_describe)

    with pytest.raises(ValueError, match="not an ASK"):
        sparql_ask(g, "SELECT ?f WHERE { ?f <lang> ?l }")
    with pytest.raises(ValueError, match="not a DESCRIBE"):
        sparql_describe(g, "ASK { ?f <lang> ?l }")


# --------------------------------------------------------------------------
# in-pattern p+ closure
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def chain_g(spark):
    rows = [("a", "p", "b", "uri"), ("b", "p", "c", "uri"),
            ("c", "p", "d", "uri"), ("x", "p", "x", "uri"),
            ("a", "label", "A", ""), ("b", "label", "B", ""),
            ("c", "label", "C", ""), ("d", "label", "D", "")]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, okind string")


def test_plus_path_both_vars(chain_g):
    got = sorted(tuple(r) for r in sparql_select(
        chain_g, "SELECT ?s ?t WHERE { ?s <p>+ ?t }").collect())
    assert got == [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
                   ("b", "d"), ("c", "d"), ("x", "x")]


def test_plus_path_joins_other_patterns(chain_g):
    got = sorted(tuple(r) for r in sparql_select(
        chain_g,
        'SELECT ?s ?l WHERE { ?s <p>+ "d" . ?s <label> ?l }').collect())
    assert got == [("a", "A"), ("b", "B"), ("c", "C")]


def test_plus_path_literal_subject_and_inverse(chain_g):
    fwd = sorted(r["t"] for r in sparql_select(
        chain_g, 'SELECT ?t WHERE { "a" <p>+ ?t }').collect())
    assert fwd == ["b", "c", "d"]
    # ^p+ from a literal object == forward closure from it as subject
    inv = sorted(r["s"] for r in sparql_select(
        chain_g, 'SELECT ?s WHERE { ?s ^<p>+ "a" }').collect())
    assert inv == fwd


def test_plus_path_same_var_cycle_nodes(chain_g):
    got = [r["n"] for r in sparql_select(
        chain_g, "SELECT ?n WHERE { ?n <p>+ ?n }").collect()]
    assert got == ["x"]


def test_plus_path_closure_hops_bound(chain_g):
    got = sorted(r["t"] for r in sparql_select(
        chain_g, 'SELECT ?t WHERE { "a" <p>+ ?t }',
        closure_hops=2).collect())
    assert got == ["b", "c"]


def test_plus_path_in_ask_and_construct(chain_g):
    from claimskg_generator_spark.operators.sparql import sparql_ask

    assert sparql_ask(
        chain_g,
        'ASK { ?s <p>+ "d" . ?s <label> ?l }').collect()[0]["ask"]
    built = sparql_construct(
        chain_g,
        "CONSTRUCT { ?s <reach> ?t } WHERE { ?s <p>+ ?t }")
    assert built.count() == 7


def test_plus_path_rejections(chain_g):
    for bad in [
        # (p* / p? are supported since q137, grouped (p1|p2)+ since
        # q153 — see the star/opt and grouped-path tests)
        "SELECT ?s WHERE { ?s <p>/<q>+ ?t }",
        "SELECT ?s WHERE { ?s <p>+/<q> ?t }",
        'SELECT ?s WHERE { "a" <p>+ "d" }',
        "SELECT ?s WHERE { ?s ?v+ ?t }",
        "SELECT ?l WHERE { OPTIONAL { ?s <p>+ ?t } . ?s <label> ?l }",
        "CONSTRUCT { ?s <p>+ ?t } WHERE { ?s <label> ?t }",
    ]:
        with pytest.raises(SparqlSyntaxError):
            parse_sparql(bad)


def test_plus_path_cartesian_guard(chain_g):
    with pytest.raises(SparqlSyntaxError, match="cartesian"):
        sparql_select(
            chain_g,
            'SELECT ?s ?l WHERE { ?s <p>+ ?t . ?u <label> ?l }'
        ).collect()


def test_plus_path_prefixed_name(chain_g, spark):
    rows = [("a", "http://example.org/code#dep", "b", "uri"),
            ("b", "http://example.org/code#dep", "c", "uri")]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, okind string")
    got = sorted(tuple(r) for r in sparql_select(
        df, """PREFIX code: <http://example.org/code#>
               SELECT ?s ?t WHERE { ?s code:dep+ ?t }""").collect())
    assert got == [("a", "b"), ("a", "c"), ("b", "c")]


def test_group_concat_and_sample_aggregates(spark):
    rows = [("f1", "repo", "r1"), ("f2", "repo", "r1"),
            ("f3", "repo", "r2"), ("f1", "lang", "py"),
            ("f2", "lang", "go"), ("f3", "lang", "py"),
            ("f2", "lang", "py")]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    q = ('SELECT ?r (GROUP_CONCAT(DISTINCT ?l ; SEPARATOR=",") AS '
         '?langs) (SAMPLE(?f) AS ?anyf) (COUNT(*) AS ?n) WHERE '
         '{ ?f <repo> ?r . ?f <lang> ?l } GROUP BY ?r ORDER BY ?r')
    got = [tuple(r) for r in sparql_select(df, q).collect()]
    # DISTINCT roster sorted; SAMPLE pinned to the minimum binding
    assert got == [("r1", "go,py", "f1", 3), ("r2", "py", "f3", 1)]
    # bag form keeps duplicates, still sorted; default separator is " "
    q2 = ("SELECT ?r (GROUP_CONCAT(?l) AS ?langs) WHERE "
          "{ ?f <repo> ?r . ?f <lang> ?l } GROUP BY ?r ORDER BY ?r")
    got2 = [tuple(r) for r in sparql_select(df, q2).collect()]
    assert got2 == [("r1", "go py py"), ("r2", "py")]


def test_group_concat_sample_rejections(spark):
    df = spark.createDataFrame([("a", "p", "b")],
                               "subj string, pred string, obj string")
    with pytest.raises(SparqlSyntaxError, match="SEPARATOR"):
        parse_sparql('SELECT (SUM(?f ; SEPARATOR=",") AS ?x) WHERE '
                     "{ ?f <p> ?r } GROUP BY ?r")
    with pytest.raises(SparqlSyntaxError, match="SAMPLE"):
        # compile-time rejection: still loud, still pre-execution
        sparql_select(df, "SELECT ?r (SAMPLE(DISTINCT ?f) AS ?x) WHERE "
                          "{ ?f <p> ?r } GROUP BY ?r")


# ---------------------------------------------------------------------------
# GRAPH named-graph blocks (quads)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def gq(spark):
    rows = [
        ("f1", "repo", "r1", "urn:g:a"),
        ("f2", "repo", "r2", "urn:g:b"),
        ("f1", "lang", "py", "urn:g:langs"),
        ("f2", "lang", "go", "urn:g:langs"),
        ("f1", RDF_TYPE, "File", None),
        ("f2", RDF_TYPE, "File", None),
        ("f3", RDF_TYPE, "File", None),
        ("f1", "next", "f2", None),
        ("f2", "next", "f3", None),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, graph string")


def test_graph_var_and_iri_blocks(gq):
    out = sparql_select(gq, """
        SELECT ?f ?r ?l ?g WHERE {
          GRAPH ?g { ?f <repo> ?r }
          GRAPH <urn:g:langs> { ?f <lang> ?l }
          ?f a "File" .
        } ORDER BY ?f
    """)
    assert [tuple(r) for r in out.collect()] == [
        ("f1", "r1", "py", "urn:g:a"), ("f2", "r2", "go", "urn:g:b")]


def test_plain_patterns_match_default_graph_only(gq):
    assert sparql_select(gq, "SELECT ?f WHERE { ?f <repo> ?r }") \
        .count() == 0
    assert sparql_select(gq, "SELECT ?f WHERE { ?f a \"File\" }") \
        .count() == 3


def test_graph_block_multi_pattern_same_graph(gq):
    # both patterns range over the SAME graph per ?g binding: the repo
    # edges live in two different graphs, so the cross-file pair dies
    out = sparql_select(gq, """
        SELECT ?g WHERE {
          GRAPH ?g { <f1> <repo> ?r . <f2> <repo> ?r2 }
        }
    """)
    assert out.count() == 0


def test_closure_runs_on_default_graph(gq):
    # p+ closure outside GRAPH walks default-graph edges only
    out = sparql_select(gq, """
        SELECT ?b WHERE { <f1> <next>+ ?b } ORDER BY ?b
    """)
    assert [r["b"] for r in out.collect()] == ["f2", "f3"]


def test_graph_prefixed_name(gq):
    out = sparql_select(gq, """
        PREFIX g: <urn:g:>
        SELECT ?f ?l WHERE { GRAPH g:langs { ?f <lang> ?l } } ORDER BY ?f
    """)
    assert [tuple(r) for r in out.collect()] == [("f1", "py"),
                                                 ("f2", "go")]


def test_graph_string_literal_name_rejected():
    with pytest.raises(SparqlSyntaxError, match="GRAPH"):
        parse_sparql('SELECT ?f WHERE { GRAPH "x" { ?f <p> ?o } }')


def test_graph_empty_block_rejected():
    with pytest.raises(SparqlSyntaxError, match="empty GRAPH"):
        parse_sparql("SELECT ?f WHERE { GRAPH ?g { } ?f <p> ?o }")


def test_graph_on_plain_triple_table_rejected(gq):
    with pytest.raises(ValueError, match="graph"):
        sparql_select(gq.select("subj", "pred", "obj"),
                      "SELECT ?f WHERE { GRAPH ?g { ?f <repo> ?r } }") \
            .collect()


def test_describe_scopes_to_default_graph(gq):
    from claimskg_generator_spark.operators.sparql import sparql_describe

    out = sparql_describe(gq, "DESCRIBE <f1>")
    got = {tuple(r) for r in out.collect()}
    # named-graph facts about f1 are not in the default-graph CBD
    assert got == {("f1", RDF_TYPE, "File"), ("f1", "next", "f2")}


# ---------------------------------------------------------------------------
# FROM / FROM NAMED dataset clauses
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def gd(spark):
    rows = [
        ("s1", "p", "a", "urn:g:1"),
        ("s2", "p", "b", "urn:g:2"),
        ("s1", "p", "a", "urn:g:2"),   # duplicate across FROM graphs
        ("s3", "p", "c", "urn:g:3"),
        ("s0", "p", "z", None),        # store default graph
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, graph string")


def test_from_merges_graphs_as_set(gd):
    out = sparql_select(gd, """
        SELECT ?s ?o FROM <urn:g:1> FROM <urn:g:2>
        WHERE { ?s <p> ?o } ORDER BY ?s
    """)
    # RDF merge is a SET union: the cross-graph duplicate collapses,
    # and the store's own default graph (s0) is not addressable
    assert [tuple(r) for r in out.collect()] == [("s1", "a"),
                                                 ("s2", "b")]


def test_from_named_restricts_graph_range(gd):
    out = sparql_select(gd, """
        SELECT ?g ?s FROM NAMED <urn:g:3>
        WHERE { GRAPH ?g { ?s <p> ?o } }
    """)
    assert [tuple(r) for r in out.collect()] == [("urn:g:3", "s3")]


def test_dataset_missing_side_is_empty(gd):
    assert sparql_select(gd, """
        SELECT ?s FROM <urn:g:1> WHERE { GRAPH ?g { ?s <p> ?o } }
    """).count() == 0
    assert sparql_select(gd, """
        SELECT ?s FROM NAMED <urn:g:1> WHERE { ?s <p> ?o }
    """).count() == 0


def test_ask_and_describe_take_dataset(gd):
    from claimskg_generator_spark.operators.sparql import (
        sparql_ask,
        sparql_describe,
    )

    assert sparql_ask(gd, 'ASK FROM <urn:g:3> { ?s <p> "c" }') \
        .collect()[0]["ask"] is True
    assert sparql_ask(gd, 'ASK FROM <urn:g:1> { ?s <p> "c" }') \
        .collect()[0]["ask"] is False
    # DESCRIBE's description scan runs over the CONSTRUCTED default
    # graph, not the store default
    got = {tuple(r) for r in
           sparql_describe(gd, "DESCRIBE <s3> FROM <urn:g:3>").collect()}
    assert got == {("s3", "p", "c")}


def test_no_dataset_clause_unchanged(gd):
    # without FROM the store default graph is what plain patterns see
    out = sparql_select(gd, "SELECT ?s WHERE { ?s <p> ?o }")
    assert [r["s"] for r in out.collect()] == ["s0"]


def test_from_rejects_var_and_plain_table(gd):
    with pytest.raises(SparqlSyntaxError, match="FROM"):
        parse_sparql("SELECT ?s FROM ?g WHERE { ?s <p> ?o }")
    with pytest.raises(ValueError, match="graph"):
        sparql_select(gd.select("subj", "pred", "obj"),
                      "SELECT ?s FROM <urn:g:1> WHERE { ?s <p> ?o }") \
            .collect()


# ---------------------------------------------------------------------------
# sub-SELECTs (SPARQL 1.1 §12)
# ---------------------------------------------------------------------------

def test_subquery_aggregate_joins_outer(g):
    out = sparql_select(g, """
        SELECT ?m ?l ?n WHERE {
          { SELECT ?m (COUNT(*) AS ?n) WHERE { ?f <imports> ?m }
            GROUP BY ?m }
          ?m <label> ?l .
        } ORDER BY ?m
    """)
    assert [tuple(r) for r in out.collect()] == [
        ("m1", "numpy", 2), ("m2", "requests", 2)]


def test_subquery_topk_with_tiebreak(g):
    out = sparql_select(g, """
        SELECT ?m ?l WHERE {
          { SELECT ?m (COUNT(*) AS ?n) WHERE { ?f <imports> ?m }
            GROUP BY ?m ORDER BY DESC(?n) ?m LIMIT 1 }
          ?m <label> ?l .
        }
    """)
    # counts tie (2 each): the ?m ascending tie-break pins m1
    assert [tuple(r) for r in out.collect()] == [("m1", "numpy")]


def test_subquery_only_group_with_filter(g):
    out = sparql_select(g, """
        SELECT ?m WHERE {
          { SELECT ?m (COUNT(*) AS ?n) WHERE { ?f <imports> ?m }
            GROUP BY ?m }
          FILTER(?n >= 2)
        } ORDER BY ?m
    """)
    assert [r["m"] for r in out.collect()] == ["m1", "m2"]


def test_subquery_distinct_projection_joins(g):
    # a plain DISTINCT projection subquery behaves as a derived relation
    out = sparql_select(g, """
        SELECT ?f WHERE {
          { SELECT DISTINCT ?f WHERE { ?f <imports> ?m } }
          ?f <lang> "python" .
        } ORDER BY ?f
    """)
    assert [r["f"] for r in out.collect()] == ["f1", "f3"]


def test_subquery_rejections(g):
    with pytest.raises(SparqlSyntaxError, match="ORDER BY in a subquery"):
        parse_sparql("""SELECT ?m WHERE {
          { SELECT ?m WHERE { ?f <imports> ?m } ORDER BY ?m } }""")
    with pytest.raises(SparqlSyntaxError, match="no FROM clause"):
        parse_sparql("""SELECT ?m WHERE {
          { SELECT ?m FROM <urn:g:1> WHERE { ?f <imports> ?m } } }""")
    with pytest.raises(SparqlSyntaxError, match="cartesian"):
        sparql_select(g, """SELECT ?m ?s WHERE {
          { SELECT ?s WHERE { ?s <label> ?x } }
          ?f <imports> ?m . }""").collect()


def test_subquery_inherits_outer_dataset(gd):
    # the outer FROM constructs the dataset BEFORE the subquery runs
    out = sparql_select(gd, """
        SELECT ?s ?n FROM <urn:g:1> FROM <urn:g:2> WHERE {
          { SELECT ?s (COUNT(*) AS ?n) WHERE { ?s <p> ?o } GROUP BY ?s }
        } ORDER BY ?s
    """)
    # the cross-graph duplicate collapsed in the merge -> s1 counts 1
    assert [tuple(r) for r in out.collect()] == [("s1", 1), ("s2", 1)]


# --------------------------------------- negated property sets (§9.1)

def test_nps_set_and_single(g):
    out = sparql_select(g, """
        SELECT ?f ?v WHERE {
          ?f <lang> "python" .
          ?f !(<imports>|<lang>|<stars>) ?v }
    """)
    assert sorted(map(tuple, out.collect())) == [("f1", "File")]
    out2 = sparql_select(
        g, 'SELECT ?v WHERE { <m1> !<imports> ?v }')
    assert sorted(map(tuple, out2.collect())) == [("numpy",)]


def test_nps_bag_semantics_per_triple(spark):
    # two surviving predicates connecting one (s, o) pair -> TWO
    # solutions (§9.1 multiset: one per matching triple)
    rows = [("a", "p1", "b", ""), ("a", "p2", "b", ""),
            ("a", "no", "b", "")]
    gg = spark.createDataFrame(
        rows, "subj string, pred string, obj string, okind string")
    out = sparql_select(gg, "SELECT ?s ?o WHERE { ?s !<no> ?o }")
    assert sorted(map(tuple, out.collect())) == [("a", "b"), ("a", "b")]


def test_nps_self_loop_and_literal_endpoints(spark):
    rows = [("x", "loop", "x", ""), ("x", "skip", "x", ""),
            ("x", "loop", "y", "")]
    gg = spark.createDataFrame(
        rows, "subj string, pred string, obj string, okind string")
    out = sparql_select(gg, "SELECT ?a WHERE { ?a !<skip> ?a }")
    assert sorted(map(tuple, out.collect())) == [("x",)]
    out2 = sparql_select(gg, 'SELECT ?s WHERE { ?s !<skip> <y> }')
    assert sorted(map(tuple, out2.collect())) == [("x",)]


def test_nps_default_graph_only(spark):
    rows = [("a", "p", "b", None), ("a", "q", "c", "urn:g:n")]
    gq = spark.createDataFrame(
        rows, "subj string, pred string, obj string, graph string")
    out = sparql_select(gq, "SELECT ?s ?o WHERE { ?s !<zz> ?o }")
    assert sorted(map(tuple, out.collect())) == [("a", "b")]


def test_nps_rejections(g):
    for bad, msg in [
        ("SELECT ?v WHERE { <f1> !^<a> ?v }", "inverse elements"),
        ("SELECT ?v WHERE { <f1> !(<a>|<b>)+ ?v }",
         "composes with no other"),
        ("SELECT ?v WHERE { <f1> !<a>/<b> ?v }",
         "composes with no other"),
        ("SELECT ?v WHERE { <f1> !?p ?v }", "must be IRIs"),
        ("SELECT ?v WHERE { <f1> !<lang> <x> }",
         "at least one variable"),
        ('SELECT ?v WHERE { OPTIONAL { ?f !<a> ?v } . '
         '?f <lang> "go" }', "required group"),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            sparql_select(g, bad).collect()


# ------------------------------------------- grouped composite paths


@pytest.fixture(scope="module")
def two_pred_g(spark):
    rows = [("a", "p", "b", "uri"), ("b", "q", "c", "uri"),
            ("c", "p", "d", "uri"), ("d", "q", "e", "uri"),
            ("e", "r", "f", "uri")]
    return spark.createDataFrame(rows, SCHEMA)


def _py_closure(edges, hops=8):
    clo = set(edges)
    for _ in range(hops - 1):
        clo |= {(a, d) for (a, b) in clo for (c, d) in edges if b == c}
    return clo


def test_group_alt_plus_undirected(chain_g):
    # (p|^p)+ == closure of the symmetrized edge set — every node on
    # an edge reaches itself through edge + inverse
    fwd = {("a", "b"), ("b", "c"), ("c", "d"), ("x", "x")}
    und = fwd | {(o, s) for (s, o) in fwd}
    got = sorted(tuple(r) for r in sparql_select(
        chain_g, "SELECT ?s ?t WHERE { ?s (<p>|^<p>)+ ?t }").collect())
    assert got == sorted(_py_closure(und))


def test_group_alt_plus_two_preds(two_pred_g):
    edges = {("a", "b"), ("c", "d"),            # p
             ("b", "c"), ("d", "e")}            # q
    got = sorted(tuple(r) for r in sparql_select(
        two_pred_g,
        "SELECT ?s ?t WHERE { ?s (<p>|<q>)+ ?t }").collect())
    assert got == sorted(_py_closure(edges))


def test_group_seq_plus(two_pred_g):
    # (p/q)+ — step = p∘q: (a,c) and (c,e); closure adds (a,e)
    got = sorted(tuple(r) for r in sparql_select(
        two_pred_g,
        "SELECT ?s ?t WHERE { ?s (<p>/<q>)+ ?t }").collect())
    assert got == [("a", "c"), ("a", "e"), ("c", "e")]


def test_group_seq_with_inverse_member(two_pred_g):
    # (p/^q) — step = p then q walked backwards: a-p->b, b<-q nothing;
    # c-p->d, d<-q... q edges are (b,c),(d,e): ^q maps c->b, e->d
    got = sorted(tuple(r) for r in sparql_select(
        two_pred_g,
        "SELECT ?s ?t WHERE { ?s (<q>/^<q>) ?t }").collect())
    # q then ^q: b->c->b, d->e->d
    assert got == [("b", "b"), ("d", "d")]


def test_group_opt_one_traversal_plus_zero(two_pred_g):
    # (p/q)? from a literal subject: itself plus ONE composed hop
    got = sorted(r["t"] for r in sparql_select(
        two_pred_g, 'SELECT ?t WHERE { "a" (<p>/<q>)? ?t }').collect())
    assert got == ["a", "c"]


def test_group_star_zero_length_literal_subject(two_pred_g):
    # (p|q)* from "e": e reaches itself unconditionally; r not in set
    got = sorted(r["t"] for r in sparql_select(
        two_pred_g, 'SELECT ?t WHERE { "e" (<p>|<q>)* ?t }').collect())
    assert got == ["e"]


def test_group_star_var_var_includes_term_domain(two_pred_g):
    # ?s (p|q)* ?s == every graph term (SPARQL 1.1 §18.4)
    got = sorted(r["s"] for r in sparql_select(
        two_pred_g, "SELECT ?s WHERE { ?s (<p>|<q>)* ?s }").collect())
    assert got == ["a", "b", "c", "d", "e", "f"]


def test_group_plus_joins_other_patterns(chain_g):
    got = sorted(tuple(r) for r in sparql_select(
        chain_g,
        'SELECT ?s ?l WHERE { ?s (<p>|^<p>)+ "d" . ?s <label> ?l }'
    ).collect())
    assert got == [("a", "A"), ("b", "B"), ("c", "C"), ("d", "D")]


def test_group_single_member_collapses_to_plain_form(chain_g):
    # (p)+ parses to the single-predicate closure pattern (str path)
    q = parse_sparql("SELECT ?s ?t WHERE { ?s (<p>)+ ?t }")
    assert q.closure_patterns == [("?s", "p", "?t", "plus")]
    # (^p)* pre-swaps endpoints exactly like ^p*
    q = parse_sparql("SELECT ?s ?t WHERE { ?s (^<p>)* ?t }")
    assert q.closure_patterns == [("?t", "p", "?s", "star")]
    a = sorted(map(tuple, sparql_select(
        chain_g, "SELECT ?s ?t WHERE { ?s (<p>)+ ?t }").collect()))
    b = sorted(map(tuple, sparql_select(
        chain_g, "SELECT ?s ?t WHERE { ?s <p>+ ?t }").collect()))
    assert a == b


def test_group_multi_member_ast_shape():
    q = parse_sparql("SELECT ?s ?t WHERE { ?s (<p>|^<q>)+ ?t }")
    assert q.closure_patterns == [
        ("?s", ("alt", ((False, "p"), (True, "q"))), "?t", "plus")]
    q = parse_sparql("SELECT ?s ?t WHERE { ?s (<p>/<q>)* ?t }")
    assert q.closure_patterns == [
        ("?s", ("seq", ((False, "p"), (False, "q"))), "?t", "star")]


def test_bare_group_is_inner_path(two_pred_g):
    # (p/q) == p/q (hidden-var sequence); (p|q) == p|q (union chain)
    a = sorted(map(tuple, sparql_select(
        two_pred_g, "SELECT ?s ?t WHERE { ?s (<p>/<q>) ?t }").collect()))
    b = sorted(map(tuple, sparql_select(
        two_pred_g, "SELECT ?s ?t WHERE { ?s <p>/<q> ?t }").collect()))
    assert a == b == [("a", "c"), ("c", "e")]
    a = sorted(map(tuple, sparql_select(
        two_pred_g, "SELECT ?s ?t WHERE { ?s (<p>|<q>) ?t }").collect()))
    b = sorted(map(tuple, sparql_select(
        two_pred_g, "SELECT ?s ?t WHERE { ?s <p>|<q> ?t }").collect()))
    assert a == b


def test_group_path_rejections(g):
    for bad, msg in [
        ("SELECT ?s WHERE { ?s (<p>+/<q>) ?o }", "group members"),
        ("SELECT ?s WHERE { ?s (<p>/<q>+) ?o }", "group members"),
        ("SELECT ?s WHERE { ?s (<p>+) ?o }", "group members"),
        ("SELECT ?s WHERE { ?s (<p>/<q>|<r>)+ ?o }", "mixing / and |"),
        ("SELECT ?s WHERE { ?s (<p>|<q>)+/<r> ?o }",
         "composes with no other"),
        ("SELECT ?s WHERE { ?s (<p>/<q>)/<r> ?o }",
         "bare path group"),
        ("SELECT ?s WHERE { ?s (?v|<q>)+ ?o }", "not variables"),
        ("SELECT ?s WHERE { <a> (<p>/<q>)+ <b> }",
         "variable endpoint"),
        ('SELECT ?v WHERE { OPTIONAL { ?f (<p>|<q>)+ ?v } . '
         '?f <lang> "go" }', "required group"),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            sparql_select(g, bad).collect()
