"""SPARQL 1.1 UPDATE subset (operators/sparql_update.py): parser
forms, (G \\ D) ∪ I set semantics, template instantiation, and the
transactional snapshot-table face (append-only insert path vs atomic
overwrite).  The q136 driver oracle pins the modify form end-to-end."""

import pytest

from claimskg_generator_spark.operators.sparql import SparqlSyntaxError
from claimskg_generator_spark.operators.sparql_update import (
    apply_update,
    apply_update_to_table,
    parse_update,
)

SCHEMA = "subj string, pred string, obj string"


@pytest.fixture()
def g(spark):
    rows = [
        ("f1", "imports", "m1"),
        ("f2", "imports", "m1"),
        ("f3", "imports", "m2"),
        ("m1", "label", "numpy"),
        ("m2", "label", "requests"),
        ("f1", "lang", "python"),
        ("f2", "lang", "go"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------- parser

def test_parse_forms():
    assert parse_update(
        "INSERT DATA { <a> <p> <b> }").form == "insert_data"
    assert parse_update(
        "DELETE DATA { <a> <p> <b> }").form == "delete_data"
    assert parse_update(
        "DELETE WHERE { ?s <p> ?o }").form == "delete_where"
    u = parse_update(
        "DELETE { ?s <p> ?o } INSERT { ?s <q> ?o } WHERE { ?s <p> ?o }")
    assert u.form == "modify"
    assert u.delete_template == [("?s", "p", "?o")]
    assert u.insert_template == [("?s", "q", "?o")]
    # insert-only / delete-only modify
    assert parse_update(
        "INSERT { ?s <q> ?o } WHERE { ?s <p> ?o }").form == "modify"
    assert parse_update(
        "DELETE { ?s <p> ?o } WHERE { ?s <p> ?o }").form == "modify"


def test_parse_prefixes_expand():
    u = parse_update("""
        PREFIX ex: <http://ex.org/>
        INSERT DATA { ex:a ex:p "v" }
    """)
    assert u.insert_template == [
        ("http://ex.org/a", "http://ex.org/p", "v")]


def test_ground_delete_where_degenerates_to_delete_data():
    u = parse_update("DELETE WHERE { <a> <p> <b> }")
    assert u.form == "delete_data"
    assert u.where is None


def test_parse_rejections():
    for bad, msg in [
        ("INSERT DATA { ?s <p> <o> }", "must be ground"),
        ("DELETE DATA { <a> ?p <o> }", "must be ground"),
        ("WITH <g> DELETE WHERE { ?s ?p ?o }",
         "WITH applies to the pattern"),
        ("LOAD <http://x/> INTO GRAPH <g>", "graph-management operation"),
        ("CLEAR ALL", "graph-management operation"),
        ("INSERT DATA { GRAPH ?g { <a> <p> <b> } }",
         "constant graph"),
        ("DELETE { ?s <p>/<q> ?o } WHERE { ?s <p> ?o }",
         "property paths"),
        ("DELETE { ?s ^<p> ?o } WHERE { ?s <p> ?o }",
         "property paths"),
        ("INSERT DATA { <a> <p> <b> } ; INSERT DATA { <c> <p> <d> }",
         "update SEQUENCE"),
        ("INSERT DATA { }", "empty triple block"),
        ("DELETE WHERE { <a> <p> <b> . ?s <p> ?o }",
         "mixing ground and variable"),
        ("SELECT ?s WHERE { ?s ?p ?o }", "expected INSERT or DELETE"),
        ("INSERT DATA { <a> <p> <b> } trailing", "trailing tokens"),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            parse_update(bad)


def test_unbound_template_var_rejected(g):
    with pytest.raises(SparqlSyntaxError, match=r"\?x is not bound"):
        apply_update(
            g, "INSERT { ?s <p2> ?x } WHERE { ?s <imports> ?o }"
        ).collect()


# ------------------------------------------------------------- semantics

def test_insert_data_is_set_union(g):
    # one triple already present, one new, one duplicated in the block
    out = apply_update(g, """INSERT DATA {
        <f1> <imports> <m1> . <n> <p> <m> . <n> <p> <m> }""")
    assert rows(out) == rows(g) + [("n", "p", "m")]


def test_delete_data_exact_and_missing_noop(g):
    out = apply_update(
        g, "DELETE DATA { <f1> <imports> <m1> . <nope> <p> <q> }")
    assert rows(out) == [r for r in rows(g) if r != ("f1", "imports", "m1")]


def test_delete_where_pattern(g):
    out = apply_update(g, "DELETE WHERE { ?s <imports> ?o }")
    assert rows(out) == [r for r in rows(g) if r[1] != "imports"]


def test_modify_rename_predicate(g):
    out = apply_update(g, """
        DELETE { ?s <imports> ?o } INSERT { ?s <uses> ?o }
        WHERE { ?s <imports> ?o }""")
    expect = [(s, "uses" if p == "imports" else p, o)
              for (s, p, o) in rows(g)]
    assert rows(out) == sorted(expect)


def test_modify_where_filters_scope(g):
    # only python files lose their imports; FILTER EXISTS drives scope
    out = apply_update(g, """
        DELETE { ?s <imports> ?o }
        WHERE { ?s <imports> ?o . ?s <lang> "python" }""")
    assert rows(out) == [r for r in rows(g)
                         if r != ("f1", "imports", "m1")]


def test_constant_template_inserts_once_iff_bindings(g, spark):
    out = apply_update(g, """
        INSERT { <audit> <ran> "1" } WHERE { ?s <lang> "go" }""")
    assert ("audit", "ran", "1") in rows(out)
    empty = apply_update(g, """
        INSERT { <audit> <ran> "1" } WHERE { ?s <lang> "rust" }""")
    assert ("audit", "ran", "1") not in rows(empty)
    assert rows(empty) == rows(g)


def test_delete_then_reinsert_same_triple_appears_once(g):
    out = apply_update(g, """
        DELETE { ?s <imports> ?o } INSERT { ?s <imports> ?o }
        WHERE { ?s <imports> ?o }""")
    assert rows(out) == rows(g)


def test_extra_columns_rejected(g):
    from pyspark.sql import functions as F
    wide = g.withColumn("okind", F.lit(""))
    with pytest.raises(ValueError, match="plain .subj, pred, obj."):
        apply_update(wide, "DELETE WHERE { ?s <imports> ?o }")


# ------------------------------------------------------- snapshot table

def _table(spark, tmp_path, g):
    from claimskg_generator_spark.sources.snapshot_table import (
        SnapshotTable,
    )
    t = SnapshotTable(spark, str(tmp_path / "t"), stat_cols=["pred"])
    t.append(g)
    return t


def test_table_insert_only_appends(spark, tmp_path, g):
    t = _table(spark, tmp_path, g)
    before = t.current_snapshot_id()
    sid = apply_update_to_table(
        t, "INSERT DATA { <f1> <imports> <m1> . <n> <p> <m> }")
    assert sid != before
    m = t.manifest(sid)
    assert m["operation"] == "append"
    assert m.get("sparql_update") == "insert_data"
    assert rows(t.read()) == rows(g) + [("n", "p", "m")]
    # time travel: the pre-update snapshot still reads the old graph
    assert rows(t.read(snapshot_id=before)) == rows(g)


def test_table_delete_side_overwrites(spark, tmp_path, g):
    t = _table(spark, tmp_path, g)
    before = t.current_snapshot_id()
    sid = apply_update_to_table(t, """
        DELETE { ?s <imports> ?o } INSERT { ?s <uses> ?o }
        WHERE { ?s <imports> ?o }""")
    assert t.manifest(sid)["operation"] == "overwrite"
    expect = sorted((s, "uses" if p == "imports" else p, o)
                    for (s, p, o) in rows(g))
    assert rows(t.read()) == expect
    assert rows(t.read(snapshot_id=before)) == rows(g)


def test_table_okind_sidecar_updates(spark, tmp_path, g):
    from pyspark.sql import functions as F
    wide = g.select(
        "subj", "pred", "obj",
        F.when(F.col("pred") == "imports", "uri").otherwise("")
         .alias("okind"))
    t = _table(spark, tmp_path, wide)
    # modify: delete matches on (s,p,o) regardless of okind; inserted
    # rows are typed from the update text (<m9> -> 'uri', "done" -> '')
    apply_update_to_table(t, """
        DELETE { ?s <imports> ?o }
        INSERT { ?s <uses> <m9> . ?s <migrated> "done" }
        WHERE { ?s <imports> ?o }""")
    got = {(r["subj"], r["pred"], r["obj"]): r["okind"]
           for r in t.read().collect()}
    assert ("f1", "imports", "m1") not in got
    assert got[("f1", "uses", "m9")] == "uri"
    assert got[("f1", "migrated", "done")] == ""
    assert got[("f1", "lang", "python")] == ""  # untouched row kept
    # insert-only on the okind table takes the append path
    sid = apply_update_to_table(t, 'INSERT DATA { <n> <p> "v" }')
    assert t.manifest(sid)["operation"] == "append"
    assert {r["okind"] for r in
            t.read().filter("subj = 'n'").collect()} == {""}


def test_table_okind_var_insert_object_rejected(spark, tmp_path, g):
    from pyspark.sql import functions as F
    t = _table(spark, tmp_path, g.withColumn("okind", F.lit("")))
    with pytest.raises(SparqlSyntaxError, match="okind-carrying"):
        apply_update_to_table(t, """
            DELETE { ?s <imports> ?o } INSERT { ?s <uses> ?o }
            WHERE { ?s <imports> ?o }""")


def test_table_unknown_extra_column_rejected(spark, tmp_path, g):
    # 'graph' is a legitimate quads sidecar now — a genuinely unknown
    # column still rejects
    from pyspark.sql import functions as F
    t = _table(spark, tmp_path, g.withColumn("lineage", F.lit("x")))
    with pytest.raises(ValueError, match="triple table"):
        apply_update_to_table(t, "DELETE WHERE { ?s <imports> ?o }")


# --------------------------------------------------------- update_delta

def test_update_delta_filters_noops(spark, g):
    from claimskg_generator_spark.operators.sparql_update import (
        update_delta,
    )
    # raw D has one absent triple; raw I has one already-present triple
    d, i = update_delta(g, """
        DELETE DATA { <f1> <imports> <m1> . <nope> <p> <q> }""")
    assert i is None
    assert rows(d) == [("f1", "imports", "m1")]
    d2, i2 = update_delta(g, """
        INSERT DATA { <f1> <imports> <m1> . <n> <p> <m> }""")
    assert d2 is None
    assert rows(i2) == [("n", "p", "m")]


def test_update_delta_reinsert_appears_both_sides(spark, g):
    from claimskg_generator_spark.operators.sparql_update import (
        update_delta,
    )
    d, i = update_delta(g, """
        DELETE { ?s <imports> ?o } INSERT { ?s <imports> ?o }
        WHERE { ?s <imports> ?o }""")
    # net zero for additive state: both sides carry the same triples
    assert rows(d) == rows(i)
    assert len(rows(d)) == 3


def test_update_delta_maintains_charset_state(spark, g):
    """The end-to-end identity q138 driver-pins, on a hand-checkable
    graph: state + effective delta == direct build over the updated
    graph."""
    from claimskg_generator_spark.operators.kg_stats import (
        characteristic_sets,
        charset_apply,
        charset_state,
        charsets_from_state,
    )
    from claimskg_generator_spark.operators.sparql_update import (
        apply_update,
        update_delta,
    )

    upd = """
        DELETE { ?s <lang> ?l } INSERT { ?s <checked> "1" }
        WHERE { ?s <lang> ?l }"""
    d, i = update_delta(g, upd)
    maintained = charsets_from_state(
        charset_apply(charset_state(g), adds=i, dels=d))
    direct = characteristic_sets(apply_update(g, upd))
    assert sorted(map(tuple, maintained.collect())) == \
        sorted(map(tuple, direct.collect()))
