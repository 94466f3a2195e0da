"""BGP matching — the SPARQL-SELECT-shaped query surface."""

from __future__ import annotations

import pytest

from argo_spark.namespaces import RDF_TYPE, SCHEMA
from argo_spark.ops.bgp import bgp_match
from argo_spark.ops.graph import TripleGraph
from argo_spark.terms import TripleT, blank, iri, literal

NAME = SCHEMA + "name"
KNOWS = "http://e/knows"


def graph(spark):
    return TripleGraph.of(
        spark,
        [
            TripleT(iri("http://e/ada"), iri(RDF_TYPE), iri(SCHEMA + "Person")),
            TripleT(iri("http://e/ada"), iri(NAME), literal("Ada")),
            TripleT(iri("http://e/alan"), iri(RDF_TYPE), iri(SCHEMA + "Person")),
            TripleT(iri("http://e/alan"), iri(NAME), literal("Alan")),
            TripleT(iri("http://e/kyoto"), iri(RDF_TYPE), iri(SCHEMA + "Place")),
            TripleT(iri("http://e/kyoto"), iri(NAME), literal("Kyoto", lang="ja")),
            TripleT(iri("http://e/ada"), iri(KNOWS), iri("http://e/alan")),
            TripleT(blank("b1"), iri(NAME), literal("Anon")),
            TripleT(iri("http://e/self"), iri(KNOWS), iri("http://e/self")),
        ],
    )


def test_single_pattern_bindings(spark):
    out = bgp_match(graph(spark).df, [("?s", RDF_TYPE, SCHEMA + "Person")])
    assert {r.s for r in out.collect()} == {"<http://e/ada>", "<http://e/alan>"}


def test_join_on_shared_variable(spark):
    out = bgp_match(
        graph(spark).df,
        [("?s", RDF_TYPE, SCHEMA + "Person"), ("?s", NAME, "?name")],
    )
    got = {(r.s, r.name) for r in out.collect()}
    assert got == {
        ("<http://e/ada>", '"Ada"'),
        ("<http://e/alan>", '"Alan"'),
    }  # Kyoto (Place) and the blank node are excluded by the type join


def test_three_pattern_chain(spark):
    out = bgp_match(
        graph(spark).df,
        [
            ("?a", KNOWS, "?b"),
            ("?a", NAME, "?an"),
            ("?b", NAME, "?bn"),
        ],
    )
    got = {(r.an, r.bn) for r in out.collect()}
    assert got == {('"Ada"', '"Alan"')}


def test_literal_constant_with_lang(spark):
    out = bgp_match(graph(spark).df, [("?s", NAME, literal("Kyoto", lang="ja"))])
    assert [r.s for r in out.collect()] == ["<http://e/kyoto>"]
    # plain "Kyoto" (no lang) is a different term — structural equality
    assert bgp_match(graph(spark).df, [("?s", NAME, literal("Kyoto"))]).count() == 0


def test_repeated_var_within_pattern(spark):
    out = bgp_match(graph(spark).df, [("?x", KNOWS, "?x")])
    assert [r.x for r in out.collect()] == ["<http://e/self>"]


def test_predicate_variable(spark):
    out = bgp_match(graph(spark).df, [(iri("http://e/ada"), "?p", "?o")])
    assert {r.p for r in out.collect()} == {
        f"<{RDF_TYPE}>", f"<{NAME}>", f"<{KNOWS}>",
    }


def test_empty_patterns_rejected(spark):
    with pytest.raises(ValueError):
        bgp_match(graph(spark).df, [])
