"""loop interpreter (loop.go:66-207) + KV triple store
(redisstore.go:29-90) semantics."""

from __future__ import annotations

import pytest

from argo_spark.namespaces import NAMESPACES, RDF, RDF_TYPE
from argo_spark.ops.loop import (
    LOOP,
    LoopError,
    LoopInterpreter,
    Resource,
    run_loop,
)
from argo_spark.sinks.kvstore import (
    InMemoryKV,
    KVTripleStore,
    bulk_add_dataframe,
    fnv1_64,
    hash_term,
)
from argo_spark.terms import Term, TripleT, blank, iri, literal

XSD = NAMESPACES["xsd"]


def xsd_lit(v, t):
    return literal(v, dt=XSD + t)


# ---------------------------------------------------------------------------
# loop
# ---------------------------------------------------------------------------

def test_literal_typing():
    it = LoopInterpreter(prefixes={"s": "http://schema.org/"})
    assert it.evaluate(xsd_lit("true", "boolean")) is True
    assert it.evaluate(xsd_lit("0", "boolean")) is False
    assert it.evaluate(xsd_lit("aGk=", "base64Binary")) == b"hi"
    assert it.evaluate(xsd_lit("6869", "hexBinary")) == b"hi"
    assert it.evaluate(xsd_lit("6.5", "double")) == 6.5
    assert it.evaluate(xsd_lit("42", "positiveInteger")) == 42
    assert it.evaluate(xsd_lit("x:y", "anyURI")) == Resource(iri("x:y"))
    assert it.evaluate(xsd_lit("s:name", "QName")) == Resource(
        iri("http://schema.org/name")
    )
    assert it.evaluate(literal("plain")) == "plain"
    assert it.evaluate(literal("salut", lang="fr")) == "salut"
    with pytest.raises(LoopError):
        it.evaluate(xsd_lit("maybe", "boolean"))
    with pytest.raises(LoopError):
        it.evaluate(xsd_lit("p:x", "QName"))  # undeclared prefix


def _add_program():
    """The reference's runloop/test.rdf program: loop:Add(3, 6.1)."""
    root = iri("http://example.org/add")
    return [
        TripleT(root, iri(RDF_TYPE), iri(LOOP + "Add")),
        TripleT(root, iri(LOOP + "a"), xsd_lit("3", "positiveInteger")),
        TripleT(root, iri(LOOP + "b"), xsd_lit("6.1", "float")),
        TripleT(iri(LOOP + "Add"), iri(RDF_TYPE), iri(LOOP + "Function")),
    ], root


def test_builtin_add_reference_program():
    trips, root = _add_program()
    it = LoopInterpreter(trips)
    assert it.evaluate(root) == pytest.approx(9.1)


def test_builtin_add_int_int_and_errors():
    root = iri("http://e/r")
    it = LoopInterpreter(
        [
            TripleT(root, iri(RDF_TYPE), iri(LOOP + "Add")),
            TripleT(root, iri(LOOP + "a"), xsd_lit("2", "integer")),
            TripleT(root, iri(LOOP + "b"), xsd_lit("40", "integer")),
            TripleT(iri(LOOP + "Add"), iri(RDF_TYPE), iri(LOOP + "Function")),
        ]
    )
    v = it.evaluate(root)
    assert v == 42 and isinstance(v, int)

    bad = LoopInterpreter(
        [
            TripleT(root, iri(RDF_TYPE), iri(LOOP + "Add")),
            TripleT(root, iri(LOOP + "a"), literal("nope")),
            TripleT(root, iri(LOOP + "b"), xsd_lit("1", "integer")),
            TripleT(iri(LOOP + "Add"), iri(RDF_TYPE), iri(LOOP + "Function")),
        ]
    )
    with pytest.raises(LoopError):
        bad.evaluate(root)


def test_user_function_code_list_and_variables():
    """fn(x) { x ; Add(x, 1) } called with x=41 -> 42 (last value of
    the loop:code list wins; arguments bind into the sub-context)."""
    fn = iri("http://e/fn")
    call = iri("http://e/call")
    argp = "http://e/arg/x"
    l1, l2 = blank("l1"), blank("l2")
    add = blank("addexpr")
    trips = [
        # the function and its body list
        TripleT(fn, iri(RDF_TYPE), iri(LOOP + "Function")),
        TripleT(fn, iri(LOOP + "code"), l1),
        TripleT(l1, iri(RDF + "first"), iri(argp)),
        TripleT(l1, iri(RDF + "rest"), l2),
        TripleT(l2, iri(RDF + "first"), add),
        TripleT(l2, iri(RDF + "rest"), iri(RDF + "nil")),
        # the body references the argument as a loop:Variable
        TripleT(iri(argp), iri(RDF_TYPE), iri(LOOP + "Argument")),
        TripleT(add, iri(RDF_TYPE), iri(LOOP + "Add")),
        TripleT(add, iri(LOOP + "a"), iri(argp)),
        TripleT(add, iri(LOOP + "b"), xsd_lit("1", "integer")),
        TripleT(iri(LOOP + "Add"), iri(RDF_TYPE), iri(LOOP + "Function")),
        # the call site: type = fn, argument property = x value
        TripleT(call, iri(RDF_TYPE), fn),
        TripleT(call, iri(argp), xsd_lit("41", "integer")),
    ]
    it = LoopInterpreter(trips)
    assert it.evaluate(call) == 42


def test_by_reference_argument():
    fn = iri("http://e/fn2")
    call = iri("http://e/call2")
    argp = "http://e/arg/r"
    l1 = blank("c1")
    trips = [
        TripleT(fn, iri(RDF_TYPE), iri(LOOP + "Function")),
        TripleT(fn, iri(LOOP + "code"), l1),
        TripleT(l1, iri(RDF + "first"), iri(argp)),
        TripleT(l1, iri(RDF + "rest"), iri(RDF + "nil")),
        TripleT(iri(argp), iri(RDF_TYPE), iri(LOOP + "Argument")),
        TripleT(iri(argp), iri(LOOP + "byReference"), xsd_lit("true", "boolean")),
        TripleT(call, iri(RDF_TYPE), fn),
        TripleT(call, iri(argp), iri("http://e/target")),
    ]
    it = LoopInterpreter(trips)
    # byReference: the argument arrives unevaluated
    assert it.evaluate(call) == Resource(iri("http://e/target"))


def test_unset_variable_and_plain_resource():
    v = iri("http://e/v")
    it = LoopInterpreter([TripleT(v, iri(RDF_TYPE), iri(LOOP + "Variable"))])
    with pytest.raises(LoopError, match="unset variable"):
        it.evaluate(v)
    assert it.evaluate(iri("http://e/other")) == Resource(iri("http://e/other"))


def test_fetcher_injection():
    """Unknown IRIs are fetched via the injected fetcher and merged
    (loop.go:57-66 ParseHTTP parity, no network)."""
    doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        f'xmlns:loop="{LOOP}">'
        '<loop:Function rdf:about="http://kierdavis.com/data/vocab/loop/Add"/>'
        "</rdf:RDF>"
    )
    fetched = []

    def fetcher(url):
        fetched.append(url)
        return doc

    root = iri("http://example.org/add")
    trips = [
        TripleT(root, iri(RDF_TYPE), iri(LOOP + "Add")),
        TripleT(root, iri(LOOP + "a"), xsd_lit("1", "integer")),
        TripleT(root, iri(LOOP + "b"), xsd_lit("2", "integer")),
        # note: NO local type triple for loop:Add — it must be fetched
    ]
    it = LoopInterpreter(trips, fetcher=fetcher)
    assert it.evaluate(root) == 3
    assert LOOP + "Add" in fetched


def test_run_loop_from_rdfxml(spark, tmp_path):
    """runloop equivalent over the reference test program
    (loop/runloop/test.rdf with prefixes declared — the original's
    rdfs prefix is undeclared, an XML validity quirk)."""
    doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        f'xmlns:loop="{LOOP}">'
        '<loop:Add rdf:about="http://example.org/add">'
        '<loop:a rdf:datatype="http://www.w3.org/2001/XMLSchema#positiveInteger">3</loop:a>'
        '<loop:b rdf:datatype="http://www.w3.org/2001/XMLSchema#float">6.1</loop:b>'
        "</loop:Add>"
        f'<loop:Function rdf:about="{LOOP}Add"/>'
        "</rdf:RDF>"
    )
    f = tmp_path / "prog.rdf"
    f.write_text(doc)
    assert run_loop(spark, str(f), "http://example.org/add") == pytest.approx(9.1)


# ---------------------------------------------------------------------------
# KV triple store
# ---------------------------------------------------------------------------

def test_fnv1_64_reference_vectors():
    # FNV-1 (multiply-then-xor): offset basis for "", published vectors
    assert fnv1_64(b"") == 0xCBF29CE484222325
    assert fnv1_64(b"a") == 0xAF63BD4C8601B7BE
    assert fnv1_64(b"foobar") == 0x340D8765A4DDA9C2


def test_store_add_remove_num_filter():
    s = KVTripleStore()
    t1 = TripleT(iri("http://e/s"), iri("http://e/p"), literal("v1"))
    t2 = TripleT(iri("http://e/s"), iri("http://e/p"), literal("v2"))
    t3 = TripleT(blank("b"), iri("http://e/q"), iri("http://e/s"))
    for t in (t1, t2, t3):
        s.add(t)
    assert s.num() == 3
    # sp composite set: objects for (s, p)
    got = {t.o for t in s.filter(s=iri("http://e/s"), p=iri("http://e/p"))}
    assert got == {literal("v1"), literal("v2")}
    # po composite: subjects for (q, s)
    subs = {t.s for t in s.filter(p=iri("http://e/q"), o=iri("http://e/s"))}
    assert subs == {blank("b")}
    # full iteration round-trips through NT lines
    assert set(s.iter_triples()) == {t1, t2, t3}
    s.remove(t2)
    assert s.num() == 2
    got = {t.o for t in s.filter(s=iri("http://e/s"), p=iri("http://e/p"))}
    assert got == {literal("v1")}
    s.clear()
    assert s.num() == 0


def test_bulk_add_dataframe(spark, tmp_path):
    """Executor-side bulk load: per-partition clients journal their
    commands to disk; the union equals a driver-side load."""
    import glob
    import json
    import os

    jdir = str(tmp_path / "journal")
    os.makedirs(jdir)

    class JournalKV(InMemoryKV):
        def __init__(self, d):
            super().__init__()
            self.f = open(f"{d}/{os.getpid()}_{id(self)}.jsonl", "a")

        def rpush(self, key, value):
            super().rpush(key, value)
            self.f.write(json.dumps(["rpush", key, value]) + "\n")
            self.f.flush()

    df = spark.createDataFrame(
        [
            (0, "http://e/s1", "http://e/p", 2, "x", None, None),
            (0, "http://e/s2", "http://e/p", 2, "y", None, None),
        ],
        "s_kind tinyint, s_value string, p_value string, o_kind tinyint, "
        "o_value string, o_lang string, o_dt string",
    ).repartition(2)
    bulk_add_dataframe(df, lambda: JournalKV(jdir))
    lines = []
    for f in glob.glob(f"{jdir}/*.jsonl"):
        lines += [json.loads(ln) for ln in open(f)]
    pushed = {ln[2] for ln in lines if ln[0] == "rpush"}
    assert pushed == {
        '<http://e/s1> <http://e/p> "x" .',
        '<http://e/s2> <http://e/p> "y" .',
    }


def test_kvstore_random_ops_vs_dict_model():
    """Random add/remove sequences: the KV store's sp-composite filter
    and triple list match a plain dict/multiset model."""
    import random

    from argo_spark.terms import format_triple

    for seed in range(3):
        rng = random.Random(seed)
        store = KVTripleStore()
        model: list = []  # list of TripleT (bag, like the RPUSH list)
        subjects = [iri(f"http://e/s{i}") for i in range(3)]
        preds = [iri(f"http://e/p{i}") for i in range(2)]
        objs = [literal(f"v{i}") for i in range(4)] + [blank("b0")]
        for _ in range(60):
            t = TripleT(rng.choice(subjects), rng.choice(preds), rng.choice(objs))
            if rng.random() < 0.7 or t not in model:
                store.add(t)
                model.append(t)
            else:
                store.remove(t)
                model = [m for m in model if m != t]  # LREM count=0: all
        assert store.num() == len(model)
        for s in subjects:
            for p in preds:
                got = {x.o for x in store.filter(s=s, p=p)}
                want = {m.o for m in model if m.s == s and m.p == p}
                assert got == want, f"seed {seed}"
        assert sorted(format_triple(*t) for t in set(store.iter_triples())) == \
               sorted(format_triple(*t) for t in set(model))
