"""Lexical-form byte compatibility (/root/reference/term.go:93-110,49-51,154-156)."""

from __future__ import annotations

from argo_spark.namespaces import split_prefix
from argo_spark.terms import (
    blank,
    escape_literal,
    format_term,
    format_triple,
    iri,
    literal,
    skolem_id,
    unescape_literal,
)


def test_escape_order():
    # backslash escaped first so later escapes aren't double-escaped
    assert escape_literal('a\\b"c\nd\re\tf') == 'a\\\\b\\"c\\nd\\re\\tf'
    assert escape_literal("\\n") == "\\\\n"
    assert unescape_literal(escape_literal('x\\"\n\r\t')) == 'x\\"\n\r\t'


def test_format_term():
    assert format_term(iri("http://example.org/a")) == "<http://example.org/a>"
    assert format_term(blank("anon")) == "_:anon"
    assert format_term(literal("simple")) == '"simple"'
    assert format_term(literal("chat", lang="fr")) == '"chat"@fr'
    assert (
        format_term(literal("typed", dt="http://example.org/dt"))
        == '"typed"^^<http://example.org/dt>'
    )
    # language wins over datatype (term.go:103-107); empty lang = absent
    assert format_term(literal("x", lang="en", dt="http://d")) == '"x"@en'
    assert format_term(literal("x", lang="", dt="http://d")) == '"x"^^<http://d>'
    # resources are NOT escaped (term.go:49-51)
    assert format_term(iri('http://e/"x"')) == '<http://e/"x">'


def test_format_triple():
    s = iri("http://example.org/s")
    p = iri("http://example.org/p")
    assert (
        format_triple(s, p, literal("v"))
        == '<http://example.org/s> <http://example.org/p> "v" .'
    )


def test_split_prefix():
    # argo.go:219-233
    assert split_prefix("http://www.w3.org/1999/02/22-rdf-syntax-ns#type") == (
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
        "type",
    )
    assert split_prefix("http://schema.org/name") == ("http://schema.org/", "name")
    assert split_prefix("urn:no-separator") == ("", "urn:no-separator")
    assert split_prefix("http://e/a#b/c") == ("http://e/a#", "b/c")


def test_skolem_deterministic():
    a = skolem_id("http://e/1", "2024-01-01 00:00:00", 0)
    b = skolem_id("http://e/1", "2024-01-01 00:00:00", 0)
    c = skolem_id("http://e/1", "2024-01-01 00:00:00", 1)
    assert a == b != c
    assert a.startswith("anon") and len(a) == 20  # anon%016x shape
