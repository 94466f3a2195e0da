"""Property-based round-trip tests (pure Python — no Spark session),
modeling the reference's own round-trip notion
(/root/reference/ntriples_test.go:139-167)."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from argo_spark.namespaces import split_prefix
from argo_spark.ntriples import parse_line
from argo_spark.terms import (
    TripleT,
    blank,
    escape_literal,
    format_triple,
    iri,
    literal,
    unescape_literal,
)

# IRI charset accepted by the reference parser (ntriples.go:207)
_iri_chars = "".join(
    c for c in (chr(i) for i in range(0x21, 0x7F)) if c not in ' <>"'
)
iris = st.text(_iri_chars, min_size=1, max_size=40).map(
    lambda s: iri("http://e/" + s)
)
blanks = st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,15}", fullmatch=True).map(blank)
# literal values: any printable + the escaped control chars
lit_values = st.text(
    string.ascii_letters + string.digits + " \\\"\n\r\t'éλ中",
    max_size=60,
)
langs = st.from_regex(r"[a-z][a-z0-9-]{0,7}", fullmatch=True)
literals = st.one_of(
    lit_values.map(literal),
    st.tuples(lit_values, langs).map(lambda t: literal(t[0], lang=t[1])),
    st.tuples(lit_values, iris).map(lambda t: literal(t[0], dt=t[1].value)),
)
subjects = st.one_of(iris, blanks)
objects = st.one_of(iris, blanks, literals)


@given(lit_values)
def test_escape_unescape_inverse(v):
    assert unescape_literal(escape_literal(v)) == v


@given(subjects, iris, objects)
@settings(max_examples=300, deadline=None)
def test_nt_round_trip(s, p, o):
    """parse(serialize(t)) == t for every representable triple —
    modulo the reference's non-ASCII IRI restriction (our generator
    stays within its charset) and raw-unicode literals (argo emits
    raw runes, term.go:93-110, and the parser accepts them)."""
    line = format_triple(s, p, o)
    t = parse_line(line, final_newline=True)
    assert t == TripleT(s, p, o), line


@given(iris)
def test_split_prefix_reassembles(t):
    base, local = split_prefix(t.value)
    assert base + local == t.value
    if base:
        assert base[-1] in "#/"
        # '#' splits first (argo.go:221-225): local never contains '#',
        # and contains '/' only when the split was at a '#'
        assert "#" not in local
        if base.endswith("/"):
            assert "/" not in local


# ---------------------------------------------------------------------------
# Parser robustness: untrusted text must yield (triples, error), never
# an unhandled exception
# ---------------------------------------------------------------------------

from hypothesis import strategies as st


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_squirtle_parser_total(text):
    from argo_spark.extract.squirtle import parse_squirtle

    triples, err = parse_squirtle(text, file_opener=lambda p: (_ for _ in ()).throw(OSError("no includes")))
    assert isinstance(triples, list)
    assert err is None or isinstance(err, str)


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=120))
@settings(max_examples=300, deadline=None)
def test_sparql_parser_total(text):
    from argo_spark.ops.sparql import SparqlSyntaxError, parse_select

    try:
        variables, patterns, distinct, limit = parse_select(text)
        assert patterns
    except SparqlSyntaxError:
        pass


@given(st.text(max_size=120))
@settings(max_examples=200, deadline=None)
def test_rdfxml_parser_total(text):
    from argo_spark.extract.rdfxml import parse_rdfxml

    triples, err = parse_rdfxml(text)
    assert isinstance(triples, list)
    assert err is None or isinstance(err, str)


@given(subjects, iris, objects)
@settings(max_examples=300, deadline=None)
def test_squirtle_block_round_trip(s, p, o):
    """parse(squirtle-block(t)) == t: the flat block layout written by
    squirtle_blocks/write_squirtle parses back exactly (escape decode
    divergence makes this hold — the reference's own pair doesn't)."""
    from argo_spark.extract.squirtle import parse_squirtle
    from argo_spark.sinks.writers import _squirtle_term

    def enc(t):
        return _squirtle_term(t.kind, t.value, t.lang, t.dt, {})

    block = f"{enc(s)} {{\n  {enc(p)} {enc(o)}\n}}\n"
    triples, err = parse_squirtle(block)
    assert err is None, (err, block)
    assert triples == [
        (s.kind, s.value, p.value, o.kind, o.value, o.lang or None, o.dt)
    ], block


@given(st.text(max_size=120))
@settings(max_examples=400, deadline=None)
def test_nt_parse_line_total(text):
    """The NT line parser is total on arbitrary input: a triple, None
    (blank/comment), or the TYPED NTParseError the distributed reader
    quarantines — never an untyped crash."""
    import pytest

    from argo_spark.ntriples import NTParseError, parse_line

    try:
        parse_line(text, final_newline=True)
    except NTParseError:
        pass  # structured quarantine path
    except Exception as e:
        pytest.fail(f"parse_line raised {type(e).__name__}: {e!r}")


# RDF/XML round-trip needs Spark for rdfxml_string's grouping, so the
# property runs driver-side over the same generators via the pure
# parser + a hand-built single-subject document.
_xml_lit_values = st.text(
    string.ascii_letters + string.digits + " \\\"<>&'éλ中\n\t",
    max_size=40,
)


@given(iris, iris, st.one_of(
    iris,
    st.tuples(_xml_lit_values, langs).map(lambda t: literal(t[0], lang=t[1])),
    _xml_lit_values.map(literal),
))
@settings(max_examples=250, deadline=None)
def test_rdfxml_roundtrip_property(s, p, o):
    """serialize-one-subject -> parse_rdfxml == original triple.
    Generator excludes carriage returns (XML 1.0 parsers normalize
    \\r to \\n — an inherent XML limitation, not a parser bug) and
    relies on the writer's XML escaping for <>&" and unicode."""
    from xml.sax.saxutils import escape as xml_escape

    from argo_spark.extract.rdfxml import parse_rdfxml
    from argo_spark.terms import KIND_IRI, KIND_LITERAL

    def q(v):
        return xml_escape(v, {'"': "&quot;"})

    if o.kind == KIND_IRI:
        prop = f'<p:x xmlns:p="#" rdf:resource="{q(o.value)}"/>'
    elif o.lang:
        prop = f'<p:x xmlns:p="#" xml:lang="{q(o.lang)}">{q(o.value)}</p:x>'
    else:
        prop = f'<p:x xmlns:p="#">{q(o.value)}</p:x>'
    doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
        f'<rdf:Description rdf:about="{q(s.value)}">{prop}'
        "</rdf:Description></rdf:RDF>"
    )
    triples, err = parse_rdfxml(doc)
    assert err is None, (err, doc)
    if o.kind == KIND_LITERAL and o.value == "":
        # an empty XML element has no character-data event: an
        # empty-literal property emits nothing (reference rdfxml.go
        # behaves identically — no CharData callback fires)
        assert triples == []
        return
    assert len(triples) == 1, doc
    sk, sv, pv, ok_, ov, ol, od = triples[0]
    assert (sk, sv) == (0, s.value)
    assert pv == "#x"
    assert (ok_, ov, ol or None, od) == (o.kind, o.value, o.lang or None, o.dt)
