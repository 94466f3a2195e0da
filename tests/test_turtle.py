"""Turtle parser (extract/turtle.py): feature coverage, error
routing, and exact round-trips through the repo's own Turtle writer
(sinks/writers.py::turtle_blocks / turtle_string) — including the
reference-fixture literal corpus, whose escape chain is the
authoritative hard case (tests/fixtures.py)."""

from __future__ import annotations

import pytest

from argo_spark.extract.turtle import (
    TurtleError, parse_turtle, parse_turtle_col, read_turtle,
)
from argo_spark.namespaces import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE
from argo_spark.ops.graph import TripleGraph
from argo_spark.sinks.writers import turtle_string, write_turtle
from argo_spark.terms import KIND_BLANK, KIND_IRI, KIND_LITERAL

XSD = "http://www.w3.org/2001/XMLSchema#"


def test_parse_features():
    doc = """
    @prefix ex: <http://ex.org/> .
    @base <http://base.org/dir/> .
    PREFIX s: <http://schema.org/>

    # comment
    ex:alice a s:Person ;
      s:age 36 ; s:height 1.72 ; s:score 1.5e3 ; s:active true ;
      s:note "multi\\nline"@en ;
      s:knows _:bob, ex:carol ;
      .
    <rel/path> s:label \"\"\"long
"quoted" text\"\"\" .
    ex:p\\~q s:name 'esc' .
    """
    triples, err = parse_turtle(doc, "k")
    assert err is None
    got = set(triples)
    A, S = "http://ex.org/alice", "http://schema.org/"
    assert (0, A, RDF_TYPE, 0, S + "Person", None, None) in got
    assert (0, A, S + "age", 2, "36", None, XSD + "integer") in got
    assert (0, A, S + "height", 2, "1.72", None, XSD + "decimal") in got
    assert (0, A, S + "score", 2, "1.5e3", None, XSD + "double") in got
    assert (0, A, S + "active", 2, "true", None, XSD + "boolean") in got
    assert (0, A, S + "note", 2, "multi\nline", "en", None) in got
    assert (0, A, S + "knows", 1, "bob", None, None) in got
    # @base resolution and PN_LOCAL_ESC
    assert (0, "http://base.org/dir/rel/path", S + "label", 2,
            'long\n"quoted" text', None, None) in got
    assert (0, "http://ex.org/p~q", S + "name", 2, "esc", None, None) in got


def test_collections_and_anon():
    doc = """@prefix ex: <http://e/> .
    ex:s ex:list ( ex:a ex:b ) ; ex:empty ( ) .
    [ ex:name "anon" ] .
    """
    triples, err = parse_turtle(doc, "k")
    assert err is None
    firsts = [t for t in triples if t[2] == RDF_FIRST]
    rests = [t for t in triples if t[2] == RDF_REST]
    assert len(firsts) == 2 and len(rests) == 2
    assert any(t[3] == KIND_IRI and t[4] == RDF_NIL for t in rests)
    assert any(
        t[2] == "http://e/empty" and t[3] == KIND_IRI and t[4] == RDF_NIL
        for t in triples
    )
    # anon labels are deterministic (skolem of (key, ordinal))
    again, _ = parse_turtle(doc, "k")
    assert sorted(triples) == sorted(again)
    other, _ = parse_turtle(doc, "other-key")
    assert sorted(triples) != sorted(other)


def test_base_chaining_and_sparql_style():
    doc = """BASE <http://a.org/x/>
    @base <sub/> .
    prefix ex: <p/>
    <leaf> <http://p/> ex:q .
    """
    triples, err = parse_turtle(doc, "k")
    assert err is None
    (t,) = triples
    # BASE then relative @base chain per RFC 3986; the PREFIX IRI
    # resolves against the base in effect at its declaration
    assert t[1] == "http://a.org/x/sub/leaf"
    assert t[4] == "http://a.org/x/sub/p/q"


@pytest.mark.parametrize("doc,frag", [
    ('<http://s> <http://p> "unterminated .', "unterminated string"),
    ("<http://s> <http://p> zz:x .", "undeclared prefix"),
    ('"lit" <http://p> <http://o> .', "literal subject"),
    ('<http://s> <http://p> "x" <http://o>', "expected ';'"),
    ("@prefix ex <http://e/> .", "bad prefix declaration"),
    ('<http://s> <http://p> "bad\\qesc" .', "bad string escape"),
])
def test_parse_errors(doc, frag):
    triples, err = parse_turtle(doc, "k")
    assert triples == [] and err is not None and frag in err, (err, frag)


def test_roundtrip_fixture_corpus(spark):
    """The writer's NT-style escape chain must invert exactly over the
    reference fixture triples (the authoritative literal corpus)."""
    from tests.fixtures import POSITIVE_CASES

    g = TripleGraph.of(spark, [t for _, t in POSITIVE_CASES]).df
    doc = turtle_string(g)
    parsed, err = parse_turtle(doc, "k")
    assert err is None
    assert set(parsed) == {tuple(r) for r in g.collect()}


def test_read_turtle_distributed(spark, tmp_path):
    """write_turtle dir -> read_turtle: exact triple-set round-trip
    via the part files (static-table prefix fallback covers the
    sidecar header); a malformed file routes to errors_df without
    voiding the good one."""
    import __spark_entry__ as em

    tr = em._doc_triples(spark, "/root/testdata/sf0.001").drop("doc_id")
    out = str(tmp_path / "ttl")
    write_turtle(tr, out)
    t2, e2 = read_turtle(spark, out)
    assert e2.count() == 0
    assert {tuple(r)[:7] for r in t2.drop("key").collect()} == {
        tuple(r) for r in tr.collect()
    }
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "a.ttl").write_text("@prefix ex: <http://e/> .\nex:s ex:p ex:o .\n")
    (bad / "b.ttl").write_text(
        "@prefix ex: <http://e/> .\nex:s ex:p .\n"  # missing object
    )
    t3, e3 = read_turtle(spark, str(bad))
    assert t3.count() == 1 and e3.count() == 1
    assert "expected term" in e3.collect()[0].error


def test_parse_turtle_col_keyed(spark):
    df = spark.createDataFrame(
        [("@prefix ex: <http://e/> . ex:a ex:p 1 .", "d1"),
         ("broken", "d2")],
        "value string, key string",
    )
    out = parse_turtle_col(df)
    rows = out.collect()
    ok = [r for r in rows if r.error is None]
    bad = [r for r in rows if r.error is not None]
    assert len(ok) == 1 and ok[0].key == "d1" and ok[0].o_value == "1"
    assert len(bad) == 1 and bad[0].key == "d2"


def test_registry_dispatch():
    from argo_spark.sinks.registry import format_from_filename

    fmt = format_from_filename("graph.ttl")
    assert fmt is not None and fmt.id == "turtle"
    assert fmt.reader is not None and fmt.writer is not None


# ---- TriG (quad mode) ------------------------------------------------------


def test_trig_parse_forms():
    from argo_spark.extract.turtle import parse_trig

    doc = """@prefix ex: <http://e/> .
    ex:d ex:p ex:o .                       # default graph, bare
    { ex:d2 ex:p ex:o2 . }                 # default graph, wrapped
    GRAPH ex:g1 { ex:a ex:p ex:b . ex:c ex:p ex:d }
    ex:g2 { ex:x ex:p "lit" }
    <http://e/g3> { [ ex:name "anon" ] . }
    """
    quads, err = parse_trig(doc, "k")
    assert err is None
    by_g = {}
    for q in quads:
        by_g.setdefault(q[7], []).append(q)
    assert len(by_g[None]) == 2
    assert len(by_g["http://e/g1"]) == 2  # optional final dot
    assert by_g["http://e/g2"][0][4] == "lit"
    assert by_g["http://e/g3"][0][0] == KIND_BLANK


def test_trig_blank_graph_label_rejected():
    from argo_spark.extract.turtle import parse_trig

    quads, err = parse_trig("GRAPH _:g { <http://s> <http://p> <http://o> }", "k")
    assert quads == [] and "blank-node graph labels" in err


def test_trig_roundtrip_writer(spark):
    """Quad frame -> write_trig -> read_trig: exact round-trip, graph
    column included (NULL = default graph)."""
    from argo_spark.extract.turtle import read_trig
    from argo_spark.sinks.writers import write_trig
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    tr = em._doc_triples(spark, "/root/testdata/sf0.001").drop("doc_id")
    quads = tr.withColumn(
        "g_value",
        F.when(
            F.col("p_value") == "http://schema.org/inLanguage",
            F.lit("http://graphs.example/lang"),
        ),
    )
    out = str(spark.conf.get("spark.local.dir", "/tmp")) + "/trig_rt"
    write_trig(quads, out)
    q2, e2 = read_trig(spark, out)
    assert e2.count() == 0
    assert {tuple(r)[:8] for r in q2.drop("key").collect()} == {
        tuple(r) for r in quads.collect()
    }


def test_truncated_documents_are_errors_not_crashes():
    """Review regression: truncated documents must yield error rows
    (the quarantine contract), never IndexError out of the Arrow
    stage. Each case previously raised."""
    from argo_spark.extract.turtle import parse_trig

    for doc in (
        "<http://s> <http://p> ",
        "<http://e/\\",
        '<http://s> <http://p> "abc\\',
        '<http://s> <http://p> "x" , ',
        "@prefix ex: <http://e/",
        "[ <http://p> ",
    ):
        triples, err = parse_turtle(doc, "k")
        assert triples == [] and isinstance(err, str), (doc, err)
    triples, err = parse_trig("GRAPH <http://g> { <http://s> <http://p> ", "k")
    assert triples == [] and isinstance(err, str)


def test_escaped_dot_local_and_signed_decimals():
    """Review regressions: PN_LOCAL_ESC'd trailing dot is part of the
    name (ex:a\\. -> local 'a.'), and signed no-integer-part decimals
    (+.5 / -.5) are valid Turtle DECIMAL."""
    triples, err = parse_turtle(
        "@prefix ex: <http://e/> .\n<http://s> <http://p> ex:a\\. .", "k"
    )
    assert err is None
    assert triples[0][4] == "http://e/a."
    for lex in ("+.5", "-.5"):
        triples, err = parse_turtle(
            f"<http://s> <http://p> {lex} .", "k"
        )
        assert err is None, (lex, err)
        assert triples[0][4:7] == (lex, None, XSD + "decimal")


def test_numeric_statement_dot_at_eof():
    """Review regression: '1.' at end-of-document swallowed the
    statement dot into the numeric lexical (empty-slice membership in
    "eE" is always True)."""
    triples, err = parse_turtle("<http://s> <http://p> 1.", "k")
    assert err is None
    assert triples[0][4:7] == ("1", None, XSD + "integer")
