"""SPARQL 1.1 UPDATE request face (operators/sparql_update.py):
``;``-chained sequences (§3.1 — each operation binds against the
previous one's result; one atomic commit per request), graph
management (§3.2 CLEAR/DROP/CREATE/COPY/MOVE/ADD as pure quads
algebra), and graph-scoped pattern updates (§3.1.3 WITH/USING/GRAPH
over the quads data model, NULL graph == default).  The q139/q140/q141
driver oracles pin the three families end-to-end; these tests pin the
parser boundaries, the per-op semantics on hand-sized graphs, and the
snapshot-table transactional contract."""

import pytest

from pyspark.sql import functions as F

from claimskg_generator_spark.operators.sparql import SparqlSyntaxError
from claimskg_generator_spark.operators.sparql_update import (
    ParsedGraphOp,
    ParsedUpdate,
    apply_graph_op,
    apply_request,
    apply_request_to_table,
    apply_update,
    apply_update_to_table,
    parse_update,
    parse_update_request,
    update_delta,
)

QSCHEMA = "subj string, pred string, obj string, graph string"
LANGS, REPOS = "urn:g:langs", "urn:g:repos"


@pytest.fixture()
def q(spark):
    rows = [
        ("f1", "lang", "py", LANGS),
        ("f2", "lang", "go", LANGS),
        ("f1", "type", "File", None),
        ("f2", "type", "File", None),
        ("f1", "repo", "r1", REPOS),
    ]
    return spark.createDataFrame(rows, QSCHEMA)


def qrows(df):
    return sorted((r.subj, r.pred, r.obj, r.graph or "~")
                  for r in df.collect())


# ---------------------------------------------------------------- parser

def test_parse_request_sequence_and_prefix_carryover():
    ops = parse_update_request("""
        PREFIX c: <urn:c:>
        INSERT DATA { <a:x> c:p "1" } ;
        DELETE DATA { <a:y> c:p "2" } ;
        CLEAR GRAPH <urn:g:x>
    """)
    assert [type(o).__name__ for o in ops] == \
        ["ParsedUpdate", "ParsedUpdate", "ParsedGraphOp"]
    # the op-2 prefix map still carries c: (one prologue scope, §3)
    assert ops[1].delete_template == [("a:y", "urn:c:p", "2")]
    assert ops[2].kind == "clear" and ops[2].src == "urn:g:x"


def test_parse_request_trailing_semicolon_and_mid_prefix():
    ops = parse_update_request("""
        INSERT DATA { <a:x> <p:p> "1" } ;
        PREFIX d: <urn:d:>
        INSERT DATA { <a:x> d:q "2" } ;
    """)
    assert len(ops) == 2
    assert ops[1].insert_template == [("a:x", "urn:d:q", "2")]


def test_parse_management_forms():
    for text, kind, src, dst in [
        ("CLEAR DEFAULT", "clear", "DEFAULT", None),
        ("DROP SILENT NAMED", "drop", "NAMED", None),
        ("CLEAR ALL", "clear", "ALL", None),
        ("CREATE GRAPH <urn:g:n>", "create", "urn:g:n", None),
        ("COPY DEFAULT TO GRAPH <urn:g:b>", "copy", "DEFAULT",
         "urn:g:b"),
        ("MOVE GRAPH <urn:g:a> TO DEFAULT", "move", "urn:g:a",
         "DEFAULT"),
        ("ADD <urn:g:a> TO <urn:g:b>", "add", "urn:g:a", "urn:g:b"),
    ]:
        (op,) = parse_update_request(text)
        assert isinstance(op, ParsedGraphOp)
        assert (op.kind, op.src, op.dst) == (kind, src, dst), text


def test_parse_graph_scoped_modify():
    u = parse_update("""
        WITH <urn:g:w>
        DELETE { ?s <p:a> ?o }
        INSERT { GRAPH <urn:g:t> { ?o <p:b> ?s } . ?s <p:c> "1" }
        USING <urn:g:u> USING NAMED <urn:g:n>
        WHERE { ?s <p:a> ?o }
    """)
    assert u.with_graph == "urn:g:w"
    assert u.using_graphs == ["urn:g:u"]
    assert u.using_named == ["urn:g:n"]
    assert u.insert_graphs == ["urn:g:t", None]
    assert u.delete_graphs == [None]
    assert u.graph_scoped


def test_parse_data_graph_wrappers_and_delete_where_graph():
    u = parse_update(
        'INSERT DATA { GRAPH <urn:g:x> { <a:s> <a:p> "1" } . '
        '<a:t> <a:p> "2" }')
    assert u.insert_graphs == ["urn:g:x", None]
    w = parse_update("DELETE WHERE { GRAPH <urn:g:x> { ?s <a:p> ?o } }")
    assert w.form == "delete_where"
    assert w.delete_graphs == ["urn:g:x"]
    assert w.where.patterns == [("?s", "a:p", "?o", "urn:g:x")]


def test_parse_request_rejections():
    for bad, msg in [
        ("", "empty update"),
        (";", "expected INSERT or DELETE"),
        ("SERVICE <http://x/sparql>", "outside the supported"),
        ("WITH <urn:g> INSERT DATA { <a:b> <a:p> \"1\" }",
         "WITH applies to the pattern"),
        ("WITH <urn:g> DELETE WHERE { ?s ?p ?o }",
         "WITH applies to the pattern"),
        ("INSERT DATA { GRAPH ?g { <a:b> <a:p> \"1\" } }",
         "constant graph"),
        ("COPY GRAPH <urn:a> TO GRAPH ?v", "constant graph"),
        ("CLEAR", "unexpected end"),
        ("ADD <urn:a> <urn:b>", "expected TO"),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            parse_update_request(bad)


# --------------------------------------------------- quads pattern updates

def test_with_scopes_where_and_targets_templates(q):
    out = apply_update(q, """
        WITH <urn:g:langs>
        DELETE { ?f <lang> ?l }
        INSERT { GRAPH <urn:g:idx> { ?l <taggedFile> ?f } .
                 ?f <hadLang> "true" }
        WHERE { ?f <lang> ?l }
    """)
    assert qrows(out) == [
        ("f1", "hadLang", "true", LANGS),
        ("f1", "repo", "r1", REPOS),
        ("f1", "type", "File", "~"),
        ("f2", "hadLang", "true", LANGS),
        ("f2", "type", "File", "~"),
        ("go", "taggedFile", "f2", "urn:g:idx"),
        ("py", "taggedFile", "f1", "urn:g:idx"),
    ]


def test_using_merges_named_graph_into_where_default(q):
    # without USING the plain pattern sees only the NULL default graph
    # (no <repo> rows there); USING <urn:g:repos> makes them visible
    out = apply_update(q, """
        INSERT { ?f <flag> "in-repo" }
        USING <urn:g:repos>
        WHERE { ?f <repo> ?r }
    """)
    assert ("f1", "flag", "in-repo", "~") in qrows(out)
    unscoped = apply_update(
        q, 'INSERT { ?f <flag> "x" } WHERE { ?f <repo> ?r }')
    assert unscoped.count() == q.count()


def test_plain_patterns_match_default_graph_only(q):
    out = apply_update(
        q, 'DELETE { ?f <type> "File" } WHERE { ?f <type> "File" }')
    assert qrows(out) == [
        ("f1", "lang", "py", LANGS),
        ("f1", "repo", "r1", REPOS),
        ("f2", "lang", "go", LANGS),
    ]


def test_same_triple_in_two_graphs_stays_distinct(q, spark):
    # inserting an existing default-graph triple into a NAMED graph
    # must not be dropped by the dedup (the quad key includes graph)
    out = apply_update(
        q, 'INSERT DATA { GRAPH <urn:g:x> { <f1> <type> "File" } }')
    assert out.count() == q.count() + 1
    # and re-inserting it into the default graph IS a no-op
    again = apply_update(
        q, 'INSERT DATA { <f1> <type> "File" }')
    assert again.count() == q.count()


def test_graph_scoped_update_on_plain_frame_rejected(spark):
    g = spark.createDataFrame([("s", "p", "o")],
                              "subj string, pred string, obj string")
    with pytest.raises(ValueError, match="quads frame"):
        apply_update(g, """
            WITH <urn:g:w> DELETE { ?s <p> ?o } WHERE { ?s <p> ?o }
        """)
    with pytest.raises(ValueError, match="quads"):
        update_delta(g, parse_update(
            "WITH <urn:g:w> DELETE { ?s <p> ?o } WHERE { ?s <p> ?o }"))


# --------------------------------------------------------- graph management

def test_clear_and_drop_targets(q):
    assert apply_graph_op(q, "CLEAR ALL").count() == 0
    assert qrows(apply_graph_op(q, "CLEAR NAMED")) == [
        ("f1", "type", "File", "~"), ("f2", "type", "File", "~")]
    assert all(r.graph is not None
               for r in apply_graph_op(q, "CLEAR DEFAULT").collect())
    out = apply_graph_op(q, "DROP GRAPH <urn:g:langs>")
    assert all(r.graph != LANGS for r in out.collect())
    assert out.count() == 3


def test_create_is_documented_noop(q):
    assert qrows(apply_graph_op(q, "CREATE GRAPH <urn:g:new>")) \
        == qrows(q)


def test_copy_replaces_destination(q):
    out = apply_graph_op(
        q, "COPY GRAPH <urn:g:langs> TO GRAPH <urn:g:repos>")
    repos = [(r.subj, r.pred, r.obj) for r in
             out.where(F.col("graph") == REPOS).collect()]
    assert sorted(repos) == [("f1", "lang", "py"), ("f2", "lang", "go")]
    assert out.count() == 6  # 2 default + 2 langs + 2 copied


def test_move_replaces_destination_and_clears_source(q):
    # §3.2.5: dst is REMOVED before insertion — the old default-graph
    # rows drop, the langs rows arrive relabeled, langs empties
    out = apply_graph_op(q, "MOVE GRAPH <urn:g:langs> TO DEFAULT")
    assert qrows(out) == [
        ("f1", "lang", "py", "~"),
        ("f1", "repo", "r1", REPOS),
        ("f2", "lang", "go", "~"),
    ]


def test_add_dedups_against_destination(q):
    # seed the destination with one of the source's rows
    seeded = q.unionByName(q.sparkSession.createDataFrame(
        [("f1", "lang", "py", REPOS)], QSCHEMA))
    out = apply_graph_op(seeded,
                         "ADD GRAPH <urn:g:langs> TO GRAPH <urn:g:repos>")
    assert out.count() == seeded.count() + 1  # only f2's row is new


def test_same_graph_copy_move_add_are_noops(q):
    for text in [
        "COPY GRAPH <urn:g:langs> TO GRAPH <urn:g:langs>",
        "MOVE DEFAULT TO DEFAULT",
        "ADD GRAPH <urn:g:langs> TO <urn:g:langs>",
    ]:
        assert qrows(apply_graph_op(q, text)) == qrows(q)


def test_graph_op_on_plain_frame_rejected(spark):
    g = spark.createDataFrame([("s", "p", "o")],
                              "subj string, pred string, obj string")
    with pytest.raises(ValueError, match="quads frame"):
        apply_graph_op(g, "CLEAR ALL")


def test_graph_op_okind_rides_along(q):
    wide = q.withColumn("okind", F.lit("uri"))
    out = apply_graph_op(wide, "MOVE GRAPH <urn:g:langs> TO DEFAULT")
    assert set(out.columns) == {"subj", "pred", "obj", "graph", "okind"}
    assert all(r.okind == "uri" for r in out.collect())


# -------------------------------------------------------------- sequences

def test_sequence_each_op_sees_previous_result(spark):
    g = spark.createDataFrame([("f1", "commit", "c9")],
                              "subj string, pred string, obj string")
    out = apply_request(g, """
        INSERT { ?f <tag> "v" } WHERE { ?f <commit> ?c } ;
        DELETE { ?f <commit> ?c }
        WHERE { ?f <tag> "v" . ?f <commit> ?c }
    """)
    assert sorted(map(tuple, out.collect())) == [("f1", "tag", "v")]


def test_sequence_equals_composed_singles(q):
    req = """
        INSERT DATA { GRAPH <urn:g:x> { <a:s> <a:p> "1" } } ;
        MOVE GRAPH <urn:g:x> TO GRAPH <urn:g:y> ;
        DELETE WHERE { GRAPH <urn:g:y> { ?s <a:p> ?o } }
    """
    seq = apply_request(q, req)
    ops = parse_update_request(req)
    manual = apply_graph_op(apply_update(q, ops[0]), ops[1])
    manual = apply_update(manual, ops[2])
    assert qrows(seq) == qrows(manual) == qrows(q)


# ----------------------------------------------------------- table faces

def _table(spark, tmp_path, df, name="t"):
    from claimskg_generator_spark.sources.snapshot_table import (
        SnapshotTable,
    )
    t = SnapshotTable(spark, str(tmp_path / name), stat_cols=["pred"])
    t.append(df)
    return t


def test_request_is_one_atomic_commit(spark, tmp_path, q):
    t = _table(spark, tmp_path, q)
    before = t.current_snapshot_id()
    apply_request_to_table(t, """
        INSERT DATA { GRAPH <urn:g:x> { <a:s> <a:p> "1" } } ;
        CLEAR GRAPH <urn:g:langs> ;
        INSERT { ?f <flagged> "y" } WHERE { ?f <type> "File" }
    """)
    sids = [s["snapshot_id"] for s in t.snapshots()]
    assert len([s for s in sids if s > before]) == 1  # ONE commit
    out = t.read()
    assert out.where(F.col("graph") == LANGS).count() == 0
    assert out.where(F.col("pred") == "flagged").count() == 2


def test_insert_only_request_appends(spark, tmp_path, q):
    t = _table(spark, tmp_path, q)
    apply_request_to_table(t, """
        INSERT DATA { <a:s> <a:p> "1" } ;
        INSERT { ?f <flagged> "y" } WHERE { ?f <type> "File" }
    """)
    last = t.snapshots()[-1]
    assert last["operation"] == "append"
    assert t.read().count() == q.count() + 3


def test_management_request_overwrites(spark, tmp_path, q):
    t = _table(spark, tmp_path, q)
    apply_request_to_table(t, "CLEAR NAMED")
    last = t.snapshots()[-1]
    assert last["operation"] == "overwrite"
    assert t.read().count() == 2


def test_graph_scoped_single_update_on_quads_table(spark, tmp_path, q):
    t = _table(spark, tmp_path, q)
    apply_update_to_table(t, """
        WITH <urn:g:langs>
        DELETE { ?f <lang> ?l }
        WHERE { ?f <lang> ?l }
    """)
    assert t.read().where(F.col("graph") == LANGS).count() == 0
    assert t.read().count() == 3


def test_quads_table_with_okind_types_inserts(spark, tmp_path, q):
    wide = q.withColumn(
        "okind", F.when(F.col("obj").startswith("urn:"), "uri")
                  .otherwise(""))
    t = _table(spark, tmp_path, wide)
    apply_request_to_table(t, """
        INSERT DATA { GRAPH <urn:g:x> { <a:s> <a:p> <urn:o> } } ;
        INSERT { ?f <flagged> "y" } WHERE { ?f <type> "File" }
    """)
    got = {(r.subj, r.okind) for r in
           t.read().where(F.col("pred").isin("a:p", "flagged"))
           .collect()}
    assert got == {("a:s", "uri"), ("f1", ""), ("f2", "")}


def test_graph_scoped_update_on_plain_table_rejected(spark, tmp_path):
    g = spark.createDataFrame([("s", "p", "o")],
                              "subj string, pred string, obj string")
    t = _table(spark, tmp_path, g)
    with pytest.raises(ValueError, match="quads table"):
        apply_update_to_table(t, """
            WITH <urn:g:w> DELETE { ?s <p> ?o } WHERE { ?s <p> ?o }
        """)
    with pytest.raises(ValueError, match="quads table"):
        apply_request_to_table(t, "CLEAR ALL")


# ------------------------------------------------------------ LOAD (§3.1.4)

def _write_nt(tmp_path, name="doc.nt"):
    p = tmp_path / name
    p.write_text(
        '<urn:a> <urn:p> "hello" .\n'
        '<urn:a> <urn:q> <urn:b> .\n'
        '<urn:c> <urn:p> "bonjour"@fr .\n',
        encoding="utf-8")
    return str(p)


def test_load_default_graph_on_plain_frame(spark, tmp_path):
    nt = _write_nt(tmp_path)
    g = spark.createDataFrame(
        [("urn:a", "urn:p", "hello", "")],
        "subj string, pred string, obj string, okind string")
    out = apply_graph_op(g, f"LOAD <file://{nt}>")
    # dedup against the existing triple; okind fidelity on new rows
    assert sorted(map(tuple, out.collect())) == [
        ("urn:a", "urn:p", "hello", ""),
        ("urn:a", "urn:q", "urn:b", "uri"),
        ("urn:c", "urn:p", "bonjour", "@fr"),
    ]


def test_load_into_named_graph(spark, tmp_path, q):
    nt = _write_nt(tmp_path)
    out = apply_graph_op(q, f"LOAD <{nt}> INTO GRAPH <urn:g:ext>")
    ext = [(r.subj, r.pred, r.obj) for r in out.collect()
           if r.graph == "urn:g:ext"]
    assert sorted(ext) == [("urn:a", "urn:p", "hello"),
                           ("urn:a", "urn:q", "urn:b"),
                           ("urn:c", "urn:p", "bonjour")]
    assert out.count() == q.count() + 3


def test_load_silent_missing_is_noop_loud_raises(spark, q):
    out = apply_graph_op(q, "LOAD SILENT <file:///nope/missing.nt>")
    assert qrows(out) == qrows(q)
    with pytest.raises(OSError):
        apply_graph_op(q, "LOAD <file:///nope/missing.nt>").collect()


def test_load_named_target_needs_quads(spark, tmp_path):
    nt = _write_nt(tmp_path)
    g = spark.createDataFrame(
        [("s", "p", "o")], "subj string, pred string, obj string")
    with pytest.raises(ValueError, match="quads"):
        apply_graph_op(g, f"LOAD <{nt}> INTO GRAPH <urn:g:x>")
    # default-graph target works on a plain frame
    assert apply_graph_op(g, f"LOAD <{nt}>").count() == 4


def test_load_request_stays_on_append_path(spark, tmp_path, q):
    nt = _write_nt(tmp_path)
    t = _table(spark, tmp_path, q)
    apply_request_to_table(t, f"""
        LOAD <{nt}> INTO GRAPH <urn:g:ext> ;
        INSERT DATA {{ <urn:z> <urn:p> "1" }}
    """)
    last = t.snapshots()[-1]
    assert last["operation"] == "append"
    assert t.read().count() == q.count() + 4


def test_load_directory_of_parts(spark, tmp_path, q):
    # the N-Triples sink layout: a directory of part-* files
    d = tmp_path / "sink"
    d.mkdir()
    (d / "part-00000.txt").write_text(
        '<urn:a> <urn:p> "x" .\n', encoding="utf-8")
    (d / "part-00001.txt").write_text(
        '<urn:b> <urn:p> "y" .\n', encoding="utf-8")
    (d / "_SUCCESS").write_text("", encoding="utf-8")
    out = apply_graph_op(q, f"LOAD <file://{d}> INTO GRAPH <urn:g:s>")
    assert out.where("graph = 'urn:g:s'").count() == 2


def test_load_unknown_sidecar_rejected(spark, tmp_path):
    nt = _write_nt(tmp_path)
    g = spark.createDataFrame(
        [("s", "p", "o", "x")],
        "subj string, pred string, obj string, lineage string")
    with pytest.raises(ValueError, match="sidecar columns"):
        apply_graph_op(g, f"LOAD <{nt}>")


def test_empty_iri_graph_name_rejected():
    # '<>' parses to '' — exactly the quad-key NULL-default sentinel;
    # admitting it would alias the default graph (review finding)
    for bad in [
        "CLEAR GRAPH <>",
        "WITH <> DELETE { ?s <p> ?o } WHERE { ?s <p> ?o }",
        "DELETE DATA { GRAPH <> { <a> <p> <b> } }",
        "COPY DEFAULT TO GRAPH <>",
        "INSERT { ?s <p> ?o } USING <> WHERE { ?s <p> ?o }",
        "LOAD <> INTO GRAPH <urn:g:x>",
    ]:
        with pytest.raises(SparqlSyntaxError, match="empty IRI"):
            parse_update_request(bad)


def test_load_silent_suppresses_parse_errors_too(spark, tmp_path, q):
    # §3.1.4: SILENT makes BOTH fetch and parse failure a success
    bad = tmp_path / "bad.nt"
    bad.write_text("this is ]] not turtle at all <<", encoding="utf-8")
    out = apply_graph_op(q, f"LOAD SILENT <file://{bad}>")
    assert qrows(out) == qrows(q)
    with pytest.raises(ValueError):
        apply_graph_op(q, f"LOAD <file://{bad}>").collect()


def test_mgmt_error_after_with_names_right_token():
    with pytest.raises(SparqlSyntaxError,
                       match="got 'CLEAR'"):
        parse_update_request("WITH <urn:g> CLEAR GRAPH <urn:h>")
