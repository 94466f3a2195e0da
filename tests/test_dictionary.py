"""Dictionary encoding (K6): deterministic ids, lossless round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from argo_spark.ops.dictionary import decode_triples, encode_triples, term_dictionary
from argo_spark.ops.graph import TripleGraph
from argo_spark.schema import TRIPLE_COLS
from argo_spark.terms import TripleT, blank, iri, literal


def graph(spark):
    return TripleGraph.of(
        spark,
        [
            TripleT(iri("http://e/s"), iri("http://e/p"), literal("v")),
            TripleT(iri("http://e/s"), iri("http://e/p"), literal("v", lang="en")),
            TripleT(blank("b"), iri("http://e/q"), literal("v", dt="http://e/dt")),
            TripleT(iri("http://e/o"), iri("http://e/p"), iri("http://e/s")),
        ],
    )


def test_round_trip(spark):
    tr = graph(spark).df
    d = term_dictionary(tr)
    enc = encode_triples(tr)
    dec = decode_triples(enc, d).select(*TRIPLE_COLS)
    assert dec.exceptAll(tr).count() == 0
    assert tr.exceptAll(dec).count() == 0


def test_ids_distinguish_lang_dt_variants(spark):
    tr = graph(spark).df
    enc = encode_triples(tr)
    # "v", "v"@en, "v"^^<dt> are three distinct object ids
    assert enc.select("o_id").distinct().count() == 4
    d = term_dictionary(tr)
    # dictionary is collision-free: one id per distinct term
    assert d.count() == d.select("term_id").distinct().count()


def test_encode_is_projection_no_shuffle(spark):
    tr = graph(spark).df
    plan = encode_triples(tr)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_same_term_same_id_across_positions(spark):
    tr = graph(spark).df
    enc = encode_triples(tr)
    d = term_dictionary(tr)
    sid = d.where("nt = '<http://e/s>'").collect()[0].term_id
    rows = enc.collect()
    assert any(r.s_id == sid for r in rows) and any(r.o_id == sid for r in rows)
