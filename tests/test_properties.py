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
        (variables, group, distinct, limit, order, offset, group_by,
         having, _dataset) = parse_select(text)
        assert group.elements or group.filters
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


# ---------------------------------------------------------------------------
# SPARQL result-XML round-trip (ops/sparql_client.py vs result.go)
# ---------------------------------------------------------------------------

from xml.sax.saxutils import escape as _xesc
from xml.sax.saxutils import quoteattr as _xattr

binding_names = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True)
# XML chardata round-trips any text without control chars; expat
# normalizes \r\n -> \n per the XML spec, so exclude \r from values
_xml_text = st.text(
    st.characters(codec="utf-8", exclude_categories=("Cc", "Cs")),
    max_size=40,
)
result_terms = st.one_of(
    _xml_text.map(iri),
    st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,10}", fullmatch=True).map(blank),
    _xml_text.map(literal),
    st.tuples(_xml_text, langs).map(lambda t: literal(t[0], lang=t[1])),
    st.tuples(_xml_text, _xml_text.filter(bool)).map(
        lambda t: literal(t[0], dt=t[1])
    ),
)
result_rows = st.lists(
    st.dictionaries(binding_names, result_terms, min_size=0, max_size=4),
    max_size=5,
)


def _render_results_xml(var_names, rows_):
    """Fuseki-shaped sparql-results+xml for the given binding rows."""
    out = ['<?xml version="1.0"?>\n<sparql xmlns="http://www.w3.org/2005/sparql-results#">\n<head>']
    for v in var_names:
        out.append(f"<variable name={_xattr(v)}/>")
    out.append("</head>\n<results>")
    for row in rows_:
        out.append("<result>")
        for name, t in row.items():
            out.append(f"<binding name={_xattr(name)}>")
            if t.kind == 0:
                out.append(f"<uri>{_xesc(t.value)}</uri>")
            elif t.kind == 1:
                out.append(f"<bnode>{_xesc(t.value)}</bnode>")
            else:
                attrs = ""
                if t.lang:
                    attrs = f" xml:lang={_xattr(t.lang)}"
                elif t.dt:
                    attrs = f" datatype={_xattr(t.dt)}"
                out.append(f"<literal{attrs}>{_xesc(t.value)}</literal>")
            out.append("</binding>")
        out.append("</result>")
    out.append("</results>\n</sparql>")
    return "".join(out)


@given(result_rows)
@settings(max_examples=200, deadline=None)
def test_sparql_result_xml_round_trip(rows_):
    """parse(render(rows)) == rows for every representable binding
    set, including entity-escaped values, lang/datatype literals and
    bnodes — and chunked feeding gives identical results to one-shot
    parsing (the streaming contract)."""
    from argo_spark.ops.sparql_client import SparqlResultParser, iter_results

    var_names = sorted({n for row in rows_ for n in row})
    doc = _render_results_xml(var_names, rows_)
    p = SparqlResultParser().parse(doc)
    assert p.vars == var_names
    assert p.results == rows_
    # chunked == one-shot
    chunks = [doc[i:i + 17] for i in range(0, len(doc), 17)]
    assert list(iter_results(chunks)) == rows_


# ---------------------------------------------------------------------------
# loopc: compiled triples round-trip through the NT serializer/parser
# ---------------------------------------------------------------------------

# reserved words (loopc.py _KEYWORDS, mirroring the reference
# lexer.go keyword table) are not valid prefix/arg identifiers — in
# the reference either (hypothesis found `of` as a generated prefix)
_LOOP_KEYWORDS = {
    "as", "boolean", "bool", "data", "false", "float", "func",
    "integer", "int", "name", "of", "resource", "res", "string",
    "str", "true",
}
_loop_words = st.from_regex(r"[a-z][a-z0-9]{0,8}", fullmatch=True).filter(
    lambda w: w not in _LOOP_KEYWORDS
)


@st.composite
def loop_programs(draw):
    """Small random LOOP programs: name decls + funcs with args,
    po-pairs and calls with constant args."""
    lines = []
    prefix = draw(_loop_words)
    lines.append(f"name <http://ns.example/{prefix}/> as {prefix}")
    n_funcs = draw(st.integers(1, 3))
    for fi in range(n_funcs):
        # an arg named like a declared prefix resolves to the prefix's
        # namespace (nameMap wins in resource_or_argument), so `of arg`
        # then yields the ""-IRI zero-value quirk — unserializable by
        # design; keep generated arg names distinct from the prefix
        args = draw(st.lists(
            _loop_words.filter(lambda w: w != prefix), max_size=2, unique=True))
        arg_str = f"({', '.join(a + ' integer' for a in args)})" if args else ""
        body = [f'rdfs:label "{draw(_loop_words)}"']
        for a in args:
            body.append(f'rdfs:comment of {a} "{draw(_loop_words)}"')
        n = draw(st.integers(-3, 3000))
        body.append(f"{prefix}:call{fi}({prefix}:a {n}, {prefix}:b true)")
        lines.append(
            f"func <http://fn.example/f{fi}>{arg_str} {{\n  "
            + "\n  ".join(body) + "\n}"
        )
    return "\n".join(lines)


@given(loop_programs())
@settings(max_examples=100, deadline=None)
def test_loopc_nt_round_trip(src):
    """compile -> N-Triples -> parse_line reproduces every compiled
    triple exactly (compiler output is always serializable, and the
    NT grammar covers every term shape loopc emits)."""
    from argo_spark.ops.loopc import compile_loop, compile_loop_nt

    triples = compile_loop(src)
    nt = compile_loop_nt(src)
    lines = [ln + "\n" for ln in nt.split("\n") if ln]
    assert len(lines) == len(triples)
    for line, t in zip(lines, triples):
        parsed = parse_line(line, final_newline=True)
        assert parsed == TripleT(t.s, t.p, t.o)


# ---------------------------------------------------------------------------
# HTML fast-path tokenizer == stdlib parser (extract/html.py)
# ---------------------------------------------------------------------------

_attr_vals = st.text(
    string.ascii_letters + string.digits + " -_.:/&;#", max_size=12
)
_tags = st.sampled_from(
    ["div", "span", "p", "a", "section", "br", "img", "script", "style"]
)


@st.composite
def html_docs(draw):
    """Well-formed-ish documents within the fast path's grammar:
    nesting, void elements, self-closing, quoted attrs with entities,
    script/style CDATA, comments, doctype, entity text."""
    parts = ['<!DOCTYPE html>']
    depth = 0
    open_tags = []
    for _ in range(draw(st.integers(1, 18))):
        kind = draw(st.integers(0, 5))
        if kind == 0 and depth < 4:
            tag = draw(_tags)
            attrs = "".join(
                f' {draw(st.sampled_from(["class", "id", "property", "data-x"]))}="{draw(_attr_vals)}"'
                for _ in range(draw(st.integers(0, 2)))
            )
            if tag in ("script", "style"):
                parts.append(f"<{tag}{attrs}>var x = 1 < 2 &amp; raw;</{tag}>")
            elif tag in ("br", "img"):
                parts.append(f"<{tag}{attrs}>")
            else:
                parts.append(f"<{tag}{attrs}>")
                open_tags.append(tag)
                depth += 1
        elif kind == 1 and open_tags:
            parts.append(f"</{open_tags.pop()}>")
            depth -= 1
        elif kind == 2:
            parts.append(draw(st.text(
                string.ascii_letters + " &amp;&lt;&#65;", max_size=20)))
        elif kind == 3:
            parts.append("<!-- a comment <div> inside -->")
        elif kind == 4:
            parts.append(f'<span title="{draw(_attr_vals)}"/>')
        else:
            parts.append("plain text &gt; here")
    return "".join(parts)


def _tree_eq(a, b):
    return (
        (a.type, a.tag, a.attrs, a.text)
        == (b.type, b.tag, b.attrs, b.text)
        and len(a.children) == len(b.children)
        and all(_tree_eq(x, y) for x, y in zip(a.children, b.children))
    )


@given(html_docs())
@settings(max_examples=300, deadline=None)
def test_fast_html_parse_matches_stdlib(doc):
    """The regex fast path must produce EXACTLY the stdlib tree on
    every document it accepts (it may bail — then parse_html falls
    back — but it may never differ)."""
    from argo_spark.extract.html import (
        _fast_parse,
        _parse_html_stdlib,
        extract_text_from_tree,
    )

    fast = _fast_parse(doc)
    if fast is None:
        return  # bailed to stdlib: fine
    std = _parse_html_stdlib(doc)
    assert _tree_eq(fast, std)
    assert extract_text_from_tree(fast) == extract_text_from_tree(std)


@given(st.text(max_size=150))
@settings(max_examples=200, deadline=None)
def test_fast_html_parse_never_differs_on_soup(doc):
    """Arbitrary soup: wherever the fast path accepts, it must agree
    with stdlib (bailing is always allowed, differing never)."""
    from argo_spark.extract.html import (
        _fast_parse,
        _parse_html_stdlib,
    )

    fast = _fast_parse(doc)
    if fast is not None:
        assert _tree_eq(fast, _parse_html_stdlib(doc))


def test_fast_html_parse_bails_on_marked_sections():
    """<![CDATA[...]]> and DOCTYPE internal subsets contain '>' inside
    the declaration; the fast path must bail to stdlib rather than
    truncate at the first '>' (round-3 advisor finding)."""
    from argo_spark.extract.html import (
        _fast_parse,
        _parse_html_stdlib,
        extract_text_from_tree,
        parse_html,
    )

    cases = [
        "<div><![CDATA[x > y]]> hi</div>",
        "<!DOCTYPE html [ <!ENTITY x 'y'> ]><p>body</p>",
        "<![if !IE]>cond<![endif]><span>tail</span>",
    ]
    for doc in cases:
        assert _fast_parse(doc) is None, doc
        # parse_html must land on the stdlib tree transparently
        assert extract_text_from_tree(parse_html(doc)) == \
            extract_text_from_tree(_parse_html_stdlib(doc)), doc
    # plain doctype (no subset) still takes the fast path
    assert _fast_parse("<!DOCTYPE html><p>x</p>") is not None


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_turtle_parser_total(text):
    """The Turtle parser is total on arbitrary input: (triples, None)
    or ([], error-string) — never an untyped crash."""
    from argo_spark.extract.turtle import parse_turtle

    triples, err = parse_turtle(text, "k")
    assert err is None or (triples == [] and isinstance(err, str))


# Turtle IRIREF has no raw backslash (UCHAR escapes only — RFC 3987
# IRIs can't contain one either); the NT generator's charset includes
# it, so the Turtle property uses a backslash-free IRI strategy
_ttl_iris = st.text(
    _iri_chars.replace("\\", ""), min_size=1, max_size=40
).map(lambda s: iri("http://e/" + s))
_ttl_subjects = st.one_of(_ttl_iris, blanks)
_ttl_literals = st.one_of(
    lit_values.map(literal),
    st.tuples(lit_values, langs).map(lambda t: literal(t[0], lang=t[1])),
    st.tuples(lit_values, _ttl_iris).map(lambda t: literal(t[0], dt=t[1].value)),
)
_ttl_objects = st.one_of(_ttl_iris, blanks, _ttl_literals)


@given(_ttl_subjects, _ttl_iris, _ttl_objects)
@settings(max_examples=300, deadline=None)
def test_turtle_block_round_trip(s, p, o):
    """parse(turtle-block(t)) == t over the full generated term
    space — the writer's block layout (trailing ';' included) with
    raw <>-IRIs and the NT escape chain."""
    from argo_spark.extract.turtle import parse_turtle

    def enc(t):
        if t.kind == 0:
            return f"<{t.value}>"
        if t.kind == 1:
            return f"_:{t.value}"
        body = f'"{escape_literal(t.value)}"'
        if t.lang:
            return f"{body}@{t.lang}"
        if t.dt:
            return f"{body}^^<{t.dt}>"
        return body

    block = f"{enc(s)}\n  <{p.value}> {enc(o)} ;\n  .\n"
    triples, err = parse_turtle(block, "k")
    assert err is None, (err, block)
    assert triples == [
        (s.kind, s.value, p.value, o.kind, o.value, o.lang or None, o.dt)
    ], block


@given(subjects, iris, objects)
@settings(max_examples=300, deadline=None)
def test_rdfjson_round_trip(s, p, o):
    """parse(rdfjson(t)) == t: the NT-keyed JSON object form parses
    back exactly for every representable triple."""
    import json as _json

    from argo_spark.extract.rdfjson import parse_rdfjson

    skey = f"<{s.value}>" if s.kind == 0 else f"_:{s.value}"
    cell = (
        {"type": "uri", "value": o.value}
        if o.kind == 0
        else {"type": "bnode", "value": "_:" + o.value}
        if o.kind == 1
        else {
            "type": "literal", "value": o.value,
            **({"lang": o.lang} if o.lang else {}),
            **({"datatype": o.dt} if o.dt else {}),
        }
    )
    doc = _json.dumps({skey: {f"<{p.value}>": [cell]}})
    triples, err = parse_rdfjson(doc)
    assert err is None, (err, doc)
    assert triples == [
        (s.kind, s.value, p.value, o.kind, o.value, o.lang or None, o.dt)
    ], doc


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_warc_parser_total(data):
    """The WARC parser is total on arbitrary bytes: (rows, error) —
    never an untyped crash out of the Arrow stage."""
    from argo_spark.sources.warc import parse_warc_pages

    rows, err = parse_warc_pages(data)
    assert err is None or isinstance(err, str)
    for url, ts, html in rows:
        assert isinstance(url, str) and isinstance(html, bytes)
