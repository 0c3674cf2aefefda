"""Property-based tests (hypothesis) over the pure scalar layer — the
functions shared by the Spark UDFs and the oracle must be total and
well-behaved on arbitrary input (SURVEY.md §5.5)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from claimskg_generator_spark.constants.ratings import (
    normalize_rating,
    normalize_rating_fast,
)
from claimskg_generator_spark.functions.cleaning import (
    clean_citation_links,
    normalize_label,
    normalize_text_fragment,
    original_rating_slug,
    process_json,
)
from claimskg_generator_spark.functions.rdfterms import to_ntriples_line
from claimskg_generator_spark.functions.textmatch import (
    porter_stem,
    span_tokenize,
)
from claimskg_generator_spark.operators.reconcile import levenshtein_similarity

text = st.text(max_size=300)
word = st.text(st.characters(categories=("Ll", "Lu")), min_size=1, max_size=20)


@given(text)
@settings(max_examples=200, deadline=None)
def test_process_json_total(s):
    # never raises; any scalar JSON (e.g. "0") passes through like the
    # reference's json.loads and is falsy-or-iterable downstream
    process_json(s)


@given(text, st.sampled_from(["snopes", "politifact", ""]))
@settings(max_examples=200, deadline=None)
def test_citations_total(links, author):
    for cleaned, uri in clean_citation_links(links, author):
        assert "?" in uri and uri.split("://", 1)[0] in ("http", "https", "ftp", "ftps")
        assert cleaned.strip() == cleaned


@given(word)
@settings(max_examples=300, deadline=None)
def test_porter_stem_properties(w):
    s = porter_stem(w)
    assert s == s.lower()
    # unicode lowercasing can EXPAND (e.g. 'İ' -> 'i̇'), so compare against
    # the lowercased input length
    assert len(s) <= len(w.lower())
    assert len(s) >= 1


@given(text)
@settings(max_examples=200, deadline=None)
def test_span_tokenize_spans_are_consistent(s):
    for b, e in span_tokenize(s):
        assert 0 <= b < e <= len(s)
        assert s[b:e].strip() == s[b:e]


@given(st.text(max_size=40), st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_levenshtein_similarity_properties(a, b):
    v = levenshtein_similarity(a, b)
    assert 0.0 <= v <= 1.0
    assert levenshtein_similarity(b, a) == v
    if a == b:
        assert v == 1.0


@given(st.text(max_size=40), st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_rating_lookup_fast_agrees(src, label):
    assert normalize_rating_fast(src, label) == normalize_rating(src, label)


@given(text)
@settings(max_examples=200, deadline=None)
def test_fragment_normalization_kills_double_quotes(s):
    assert '"' not in normalize_text_fragment(s)
    assert '"' not in normalize_label(s)
    assert "'" not in normalize_label(s)


@given(text, text, text)
@settings(max_examples=100, deadline=None)
def test_rating_slug_is_uri_safe(a, b, c):
    slug = original_rating_slug(a, b, c)
    for ch in " []'\\/<>":
        assert ch not in slug


@given(text, st.sampled_from(["", "@en",
                              "http://www.w3.org/2001/XMLSchema#date"]))
@settings(max_examples=200, deadline=None)
def test_ntriples_literal_line_is_single_line(obj, okind):
    # literals get full escaping; URI objects are the engine's own minted
    # URIs (control chars out of domain)
    line = to_ntriples_line("http://s", "http://p", obj, okind)
    assert "\n" not in line and "\r" not in line
    assert line.endswith(" .")


# ---------------------------------------------------------------------------
# SPARQL parser totality (operators/sparql.py)
# ---------------------------------------------------------------------------

_SPARQL_TOKENS = [
    "SELECT", "WHERE", "{", "}", "(", ")", "?x", "?y", "<urn:p>",
    "GRAPH", "FROM", "NAMED", "OPTIONAL", "MINUS", "FILTER", "BIND",
    "UNION", "VALUES", "AS", "COUNT", "*", ".", ",", ";", "a",
    '"lit"', "42", "ORDER", "BY", "LIMIT", "GROUP", "HAVING", "ASC",
    "DESC", "+", "/", "^", "|", "=", "!=", "!", "&&", "||", "pfx:name",
    "PREFIX", ":", "CONSTRUCT", "ASK", "DESCRIBE", "DISTINCT",
]


@given(st.lists(st.sampled_from(_SPARQL_TOKENS), min_size=1,
                max_size=25))
@settings(max_examples=300, deadline=None)
def test_sparql_parser_total_on_token_soup(toks):
    """The recursive-descent parser is TOTAL over its own alphabet:
    any token soup either parses or raises SparqlSyntaxError — never
    an IndexError / AttributeError / RecursionError escape."""
    from claimskg_generator_spark.operators.sparql import (
        SparqlSyntaxError,
        parse_sparql,
    )

    try:
        parse_sparql(" ".join(toks))
    except SparqlSyntaxError:
        pass


@given(
    st.integers(1, 4),
    st.booleans(), st.booleans(), st.booleans(),
    st.lists(st.sampled_from(["<urn:g:1>", "<urn:g:2>"]), max_size=2),
)
@settings(max_examples=60, deadline=None)
def test_sparql_wellformed_queries_parse(n_pat, use_graph, distinct,
                                         use_sub, from_iris):
    """Queries composed from the subset's own building blocks always
    parse, and the AST reflects what went in (pattern counts, dataset
    lists, subquery presence)."""
    from claimskg_generator_spark.operators.sparql import parse_sparql

    pats = " . ".join(f"?s{i} <urn:p{i}> ?o{i}" for i in range(n_pat))
    body = f"{pats} ."
    if use_graph:
        body += " GRAPH ?g { ?s0 <urn:q> ?z } ."
    if use_sub:
        body += (" { SELECT ?s0 (COUNT(*) AS ?n) WHERE "
                 "{ ?s0 <urn:r> ?w } GROUP BY ?s0 } ")
    q = ("SELECT " + ("DISTINCT " if distinct else "") + "* "
         + " ".join(f"FROM {iri}" for iri in from_iris)
         + " WHERE { " + body + " }")
    ast = parse_sparql(q)
    n_graph = 1 if use_graph else 0
    assert len(ast.patterns) == n_pat + n_graph
    assert sum(1 for p in ast.patterns if len(p) == 4) == n_graph
    assert len(ast.subqueries) == (1 if use_sub else 0)
    assert ast.from_graphs == [i[1:-1] for i in from_iris]
    assert ast.distinct == distinct


# ---------------------------------------------------------------------------
# SPARQL UPDATE parser totality (operators/sparql_update.py)
# ---------------------------------------------------------------------------

_UPDATE_TOKENS = [
    "INSERT", "DELETE", "DATA", "WHERE", "{", "}", "?x", "?y",
    "<urn:p>", "<urn:s>", '"lit"', "42", "a", ".", ";", "PREFIX",
    ":", "pfx:name", "FILTER", "OPTIONAL", "MINUS", "GRAPH", "WITH",
    "USING", "LOAD", "CLEAR", "+", "*", "?", "/", "^", "|", "(",
    ")", "=", "EXISTS", "NOT", "!", "SILENT", "TO", "INTO",
    "DEFAULT", "NAMED", "ALL", "DROP", "CREATE", "COPY", "MOVE",
    "ADD", "<>",
]


@given(st.lists(st.sampled_from(_UPDATE_TOKENS), min_size=1,
                max_size=25))
@settings(max_examples=300, deadline=None)
def test_update_parser_total_on_token_soup(toks):
    """parse_update is TOTAL over its own alphabet: any token soup
    either parses or raises SparqlSyntaxError — never an IndexError /
    KeyError / RecursionError escape."""
    from claimskg_generator_spark.operators.sparql import (
        SparqlSyntaxError,
    )
    from claimskg_generator_spark.operators.sparql_update import (
        parse_update,
    )

    try:
        parse_update(" ".join(toks))
    except SparqlSyntaxError:
        pass


@given(st.lists(st.sampled_from(_UPDATE_TOKENS), min_size=1,
                max_size=25))
@settings(max_examples=300, deadline=None)
def test_update_request_parser_total_on_token_soup(toks):
    """parse_update_request (sequences + management + LOAD + quads
    scoping) is TOTAL over the extended alphabet too."""
    from claimskg_generator_spark.operators.sparql import (
        SparqlSyntaxError,
    )
    from claimskg_generator_spark.operators.sparql_update import (
        parse_update_request,
    )

    try:
        parse_update_request(" ".join(toks))
    except SparqlSyntaxError:
        pass


@given(
    st.integers(1, 3), st.integers(0, 3),
    st.sampled_from(["insert_data", "delete_data", "modify"]),
)
@settings(max_examples=60, deadline=None)
def test_update_wellformed_requests_parse(n_del, n_ins, form):
    """Requests composed from the subset's building blocks parse and
    the AST carries the right templates and okinds."""
    from claimskg_generator_spark.operators.sparql_update import (
        parse_update,
    )

    ground = " . ".join(f"<urn:s{i}> <urn:p{i}> <urn:o{i}>"
                        for i in range(n_del))
    if form == "insert_data":
        u = parse_update(f"INSERT DATA {{ {ground} }}")
        assert u.form == "insert_data"
        assert len(u.insert_template) == n_del
        assert u.insert_okinds == ["uri"] * n_del
    elif form == "delete_data":
        u = parse_update(f"DELETE DATA {{ {ground} }}")
        assert u.form == "delete_data"
        assert len(u.delete_template) == n_del
    else:
        dels = " . ".join(f"?s <urn:p{i}> ?o" for i in range(n_del))
        ins = " . ".join(f'?s <urn:q{i}> "v{i}"' for i in range(n_ins))
        text = f"DELETE {{ {dels} }}"
        if n_ins:
            text += f" INSERT {{ {ins} }}"
        text += " WHERE { ?s <urn:p0> ?o }"
        u = parse_update(text)
        assert u.form == "modify"
        assert len(u.delete_template) == n_del
        assert len(u.insert_template) == n_ins
        assert u.insert_okinds == [""] * n_ins
