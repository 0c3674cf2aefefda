"""Turtle source for the DBpedia categories SKOS graph (S4).

Reference: claimskg/generator/__init__.py:158 —
``self._graph.load("claimskg/data/dbpedia_categories_lang_en_skos.ttl",
format="turtle")`` unions the whole category-label SKOS graph into the
output graph before generation (the ``.ttl`` blob itself is absent from
the reference repository).  The per-mention ``dct:about dbc:Category``
triples are a separate family (generator/__init__.py:559-561, covered by
the mentions operator); this module covers the graph-union side: parse a
Turtle document into ``(subj, pred, obj, okind)`` rows and append them to
the static/thesaurus union branch.

rdflib is not available in this environment, so this is a from-scratch
streaming tokenizer + statement parser for the Turtle subset that SKOS
dumps (DBpedia categories, GESIS TheSoz turtle exports) actually use:

- ``@prefix`` / ``PREFIX`` / ``@base`` / ``BASE`` directives
- IRIREF, prefixed names (incl. ``PN_LOCAL_ESC`` backslash escapes and
  percent-encoded local parts), the ``a`` keyword, ``_:`` blank labels
- ``;`` predicate lists and ``,`` object lists
- short/long single/double-quoted literals with ``\\``-escapes and
  ``\\uXXXX``/``\\UXXXXXXXX``; optional ``@lang`` or ``^^datatype``
- numeric (integer/decimal/double) and boolean literals

NOT supported (rejected loudly, never silently misparsed): ``[...]``
anonymous blank-node property lists and ``(...)`` collections — neither
occurs in SKOS label dumps.

Scale posture: the categories graph is a *dimension* input (the full
DBpedia categories-labels dump is ~10^7 triples), the same class as the
SKOS thesaurus (sources/skos_xml.py) — the reference holds it entirely in
driver rdflib memory; we stream-tokenize it once on the driver in O(1)
extra memory per statement and hand Spark a distributed frame for the
graph union, so the dedup shuffle and every downstream operator stay
distributed.  Literal okind follows functions/rdfterms.py: ``"uri"``,
``""`` (plain), ``"@lang"``, or a full datatype IRI.
"""

import re
from typing import Dict, Iterator, List, Tuple

from claimskg_generator_spark.constants.namespaces import NS
from claimskg_generator_spark.functions.rdfterms import OKIND_PLAIN, OKIND_URI

XSD = "http://www.w3.org/2001/XMLSchema#"

# longest-match-first token alternatives; order matters (long strings
# before short, doubles before decimals before integers)
_TOKEN = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<iriref><[^<>"{}|^`\\\x00-\x20]*>)
    | (?P<string>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\"
               | '''(?:[^'\\]|\\.|'(?!''))*'''
               | \"(?:[^"\\\n\r]|\\.)*\"
               | '(?:[^'\\\n\r]|\\.)*')
    | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
    | (?P<dtype>\^\^)
    | (?P<double>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+))
    | (?P<decimal>[+-]?\d*\.\d+)
    | (?P<integer>[+-]?\d+)
    | (?P<punct>[;,.\[\]()])
    | (?P<bnode>_:[\w\-](?:[\w.\-]*[\w\-])?)
    | (?P<prefixed>(?:[A-Za-z_](?:[\w.\-]*[\w\-])?)?:
        (?:(?:[\w:%.\-]|\\[_~.\-!$&'()*+,;=/?\#@%])*
           (?:[\w:%\-]|\\[_~.\-!$&'()*+,;=/?\#@%]))?)
    | (?P<keyword>(?:@prefix|@base|[Pp][Rr][Ee][Ff][Ii][Xx]|[Bb][Aa][Ss][Ee]
                    |a|true|false)(?![\w.\-]))
    """,
    re.VERBOSE,
)

_STRING_ESC = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


class TurtleParseError(ValueError):
    pass


def _tokenize(text: str) -> Iterator[Tuple[str, str]]:
    pos, n = 0, len(text)
    while pos < n:
        m = _TOKEN.match(text, pos)
        if m is None:
            snippet = text[pos:pos + 40]
            raise TurtleParseError(f"unrecognized Turtle at offset {pos}: {snippet!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        # context-free lexer quirk: '@prefix'/'@base' match the langtag
        # pattern; they are directives everywhere except after a literal,
        # and no real language tag collides with them
        if kind == "langtag" and m.group() in ("@prefix", "@base"):
            kind = "keyword"
        # `a`/`true`/`false`/directives can also lex as prefixed-name heads;
        # the keyword branch is ordered after `prefixed`, so a bare match in
        # `prefixed` that IS a keyword never happens (keywords contain no
        # ':'), and `prefixed` requires a ':'.
        yield kind, m.group()


def _unescape_string(raw: str) -> str:
    if raw.startswith('"""') or raw.startswith("'''"):
        body = raw[3:-3]
    else:
        body = raw[1:-1]
    out: List[str] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        e = body[i + 1]
        if e == "u":
            out.append(chr(int(body[i + 2:i + 6], 16)))
            i += 6
        elif e == "U":
            out.append(chr(int(body[i + 2:i + 10], 16)))
            i += 10
        elif e in _STRING_ESC:
            out.append(_STRING_ESC[e])
            i += 2
        else:
            raise TurtleParseError(f"bad string escape \\{e}")
    return "".join(out)


def _unescape_iri(raw: str) -> str:
    body = raw[1:-1]
    if "\\" not in body:
        return body
    return re.sub(
        r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})",
        lambda m: chr(int(m.group(1) or m.group(2), 16)),
        body,
    )


def _resolve(iri: str, base: str) -> str:
    if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri) or not base:
        return iri
    if iri.startswith("#") or not iri:
        return base.split("#")[0] + iri
    # minimal RFC 3986 merge for the relative forms SKOS dumps use
    if iri.startswith("//"):
        return base.split(":", 1)[0] + ":" + iri
    if iri.startswith("/"):
        m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/]*)", base)
        return (m.group(1) if m else base) + iri
    return base.rsplit("/", 1)[0] + "/" + iri


_PN_LOCAL_UNESC = re.compile(r"\\([_~.\-!$&'()*+,;=/?\#@%])")


def _expand_pname(tok: str, prefixes: Dict[str, str]) -> str:
    pfx, local = tok.split(":", 1)
    if pfx not in prefixes:
        raise TurtleParseError(f"undefined prefix {pfx!r}: in {tok!r}")
    return prefixes[pfx] + _PN_LOCAL_UNESC.sub(r"\1", local)


def parse_turtle(text: str) -> Iterator[Tuple[str, str, str, str]]:
    """Parse a Turtle document into (subj, pred, obj, okind) rows.

    Generator — O(statement) memory; prefix/base state is carried in two
    small dicts, exactly the streaming shape a 10^7-triple dump needs.
    """
    prefixes: Dict[str, str] = {}
    base = ""
    toks = _tokenize(text)

    def _next(expect: str = "term"):
        try:
            return next(toks)
        except StopIteration:
            raise TurtleParseError(f"unexpected EOF (wanted {expect})")

    def _term(kind: str, val: str, as_subject: bool = False):
        """Resolve one RDF term token -> (lexical, okind)."""
        if kind == "iriref":
            return _resolve(_unescape_iri(val), base), OKIND_URI
        if kind == "prefixed":
            return _expand_pname(val, prefixes), OKIND_URI
        if kind == "bnode":
            return val, OKIND_URI
        if as_subject:
            raise TurtleParseError(f"bad subject token {val!r}")
        if kind == "string":
            return _unescape_string(val), OKIND_PLAIN
        if kind == "integer":
            return val, XSD + "integer"
        if kind == "decimal":
            return val, XSD + "decimal"
        if kind == "double":
            return val, XSD + "double"
        if kind == "keyword" and val in ("true", "false"):
            return val, XSD + "boolean"
        if kind == "punct" and val in "[(":
            raise TurtleParseError(
                "blank-node property lists / collections are not supported "
                "(not used by SKOS category dumps)")
        raise TurtleParseError(f"bad term token {val!r}")

    def _object():
        kind, val = _next("object")
        lex, okind = _term(kind, val)
        if kind == "string":
            # peek for @lang / ^^datatype
            nk, nv = _next(". ; or , after literal")
            if nk == "langtag":
                return lex, nv, None
            if nk == "dtype":
                dk, dv = _next("datatype IRI")
                diri, dok = _term(dk, dv)
                if dok != OKIND_URI:
                    raise TurtleParseError(f"datatype must be an IRI, got {dv!r}")
                if diri == XSD + "string":
                    return lex, OKIND_PLAIN, None
                return lex, diri, None
            return lex, OKIND_PLAIN, (nk, nv)
        return lex, okind, None

    def _predicate(pk, pv):
        if pk == "keyword" and pv == "a":
            return NS.RDF_TYPE
        piri, pok = _term(pk, pv)
        if pok != OKIND_URI or piri.startswith("_:"):
            raise TurtleParseError(f"bad predicate {pv!r}")
        return piri

    for kind, val in toks:
        # --- directives ---
        if kind == "keyword" and val.lower() in ("@prefix", "prefix"):
            pk, pv = _next("prefix name")
            if pk != "prefixed" or not pv.endswith(":"):
                raise TurtleParseError(f"bad @prefix name {pv!r}")
            ik, iv = _next("prefix IRI")
            if ik != "iriref":
                raise TurtleParseError(f"bad @prefix IRI {iv!r}")
            prefixes[pv[:-1]] = _resolve(_unescape_iri(iv), base)
            if val == "@prefix":
                dk, dv = _next("'.'")
                if (dk, dv) != ("punct", "."):
                    raise TurtleParseError("@prefix directive missing '.'")
            continue
        if kind == "keyword" and val.lower() in ("@base", "base"):
            ik, iv = _next("base IRI")
            if ik != "iriref":
                raise TurtleParseError(f"bad @base IRI {iv!r}")
            base = _resolve(_unescape_iri(iv), base)
            if val == "@base":
                dk, dv = _next("'.'")
                if (dk, dv) != ("punct", "."):
                    raise TurtleParseError("@base directive missing '.'")
            continue

        # --- triple statement ---
        subj, _ = _term(kind, val, as_subject=True)
        pk, pv = _next("predicate")
        while True:  # predicate list
            pred = _predicate(pk, pv)
            while True:  # object list
                lex, okind, lookahead = _object()
                yield subj, pred, lex, okind
                nk, nv = lookahead or _next("'.' ';' or ','")
                if (nk, nv) != ("punct", ","):
                    break
            if (nk, nv) == ("punct", "."):
                break
            if (nk, nv) != ("punct", ";"):
                raise TurtleParseError(f"expected '.' ';' or ',', got {nv!r}")
            pk, pv = _next("predicate or '.'")
            if (pk, pv) == ("punct", "."):  # trailing ';' before '.'
                break


def parse_turtle_file(path: str) -> List[Tuple[str, str, str, str]]:
    """Read + parse a Turtle file (the CLI `--categories` surface)."""
    with open(path, encoding="utf-8") as f:
        return list(parse_turtle(f.read()))
