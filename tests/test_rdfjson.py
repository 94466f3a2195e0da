"""RDF/JSON parser (extract/rdfjson.py): both key flavors, error
routing, and exact round-trips through the repo's own writer."""

from __future__ import annotations

import pytest

from argo_spark.extract.rdfjson import (
    parse_rdfjson, parse_rdfjson_col, read_rdfjson,
)
from argo_spark.ops.graph import TripleGraph
from argo_spark.sinks.writers import rdfjson_string


def test_parse_w3c_bare_keys():
    doc = """{
      "http://e/a": {
        "http://p/name": [
          {"type": "literal", "value": "Alice"},
          {"type": "literal", "value": "Alise", "lang": "fi"},
          {"type": "literal", "value": "42",
           "datatype": "http://www.w3.org/2001/XMLSchema#integer"}
        ],
        "http://p/knows": [{"type": "bnode", "value": "_:b"}]
      },
      "_:b": {"http://p/ref": [{"type": "uri", "value": "http://e/a"}]}
    }"""
    triples, err = parse_rdfjson(doc)
    assert err is None
    got = set(triples)
    assert (0, "http://e/a", "http://p/name", 2, "Alice", None, None) in got
    assert (0, "http://e/a", "http://p/name", 2, "Alise", "fi", None) in got
    assert (0, "http://e/a", "http://p/name", 2, "42", None,
            "http://www.w3.org/2001/XMLSchema#integer") in got
    assert (0, "http://e/a", "http://p/knows", 1, "b", None, None) in got
    assert (1, "b", "http://p/ref", 0, "http://e/a", None, None) in got


def test_parse_json_lines_nt_keys():
    doc = (
        '{"<http://e/a>": {"<http://p/x>": [{"type": "uri", '
        '"value": "http://e/b"}]}}\n'
        '{"_:z": {"<http://p/x>": [{"type": "literal", "value": "v"}]}}\n'
    )
    triples, err = parse_rdfjson(doc)
    assert err is None
    assert set(triples) == {
        (0, "http://e/a", "http://p/x", 0, "http://e/b", None, None),
        (1, "z", "http://p/x", 2, "v", None, None),
    }


@pytest.mark.parametrize("doc,frag", [
    ("[1, 2]", "top level is not a JSON object"),
    ('{"http://s": {"_:p": [{"type": "uri", "value": "http://o"}]}}',
     "blank node in predicate"),
    ('{"http://s": {"http://p": [{"type": "wat", "value": "x"}]}}',
     "unknown object type"),
    ('{"http://s": {"http://p": [{"type": "uri"}]}}', "bad object cell"),
    ('{"http://s": "nope"}', "non-object"),
    ("nope {", "invalid JSON"),
])
def test_parse_errors(doc, frag):
    triples, err = parse_rdfjson(doc)
    assert triples == [] and err is not None and frag in err, (err, frag)


def test_roundtrip_writer_fixture_corpus(spark):
    """rdfjson_string output (NT keys, valid JSON) re-parses to the
    exact fixture triple set — the writer/reader pair is lossless."""
    from tests.fixtures import POSITIVE_CASES

    g = TripleGraph.of(spark, [t for _, t in POSITIVE_CASES]).df
    triples, err = parse_rdfjson(rdfjson_string(g))
    assert err is None
    assert set(triples) == {tuple(r) for r in g.collect()}


def test_read_rdfjson_distributed(spark, tmp_path):
    """format-registry write (JSON lines) -> read_rdfjson: exact
    round-trip; a malformed file routes to errors_df."""
    import __spark_entry__ as em
    from argo_spark.sinks.registry import FORMATS

    tr = em._doc_triples(spark, "/root/testdata/sf0.001").drop("doc_id")
    out = str(tmp_path / "json")
    FORMATS["json"].writer(tr, out)
    t2, e2 = read_rdfjson(spark, out)
    assert e2.count() == 0
    assert {tuple(r)[:7] for r in t2.drop("key").collect()} == {
        tuple(r) for r in tr.collect()
    }
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "a.json").write_text('{"http://s": {"http://p": [{"type": "uri", "value": "http://o"}]}}')
    (bad / "b.json").write_text("{broken")
    t3, e3 = read_rdfjson(spark, str(bad))
    assert t3.count() == 1 and e3.count() == 1


def test_registry_dispatch():
    from argo_spark.sinks.registry import format_from_filename

    fmt = format_from_filename("graph.json")
    assert fmt is not None and fmt.id == "json"
    assert fmt.reader is not None and fmt.writer is not None
