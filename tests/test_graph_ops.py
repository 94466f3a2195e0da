"""Graph operators G1-G16 (SURVEY §2.3) and the rewrite stage."""

from __future__ import annotations

from argo_spark.namespaces import RDF, RDF_TYPE
from argo_spark.ops.graph import (
    TripleGraph,
    encode_container,
    encode_list,
    first_type_per_subject,
    iter_container,
    iter_list,
)
from argo_spark.ops.rewrite import rewrite_terms
from argo_spark.terms import TripleT, blank, iri, literal

S1 = iri("http://e/s1")
S2 = iri("http://e/s2")
P1 = iri("http://e/p1")
P2 = iri("http://e/p2")


def g(spark):
    return TripleGraph.of(
        spark,
        [
            TripleT(S1, P1, iri("http://e/o1")),
            TripleT(S1, P1, literal("v1")),
            TripleT(S1, P2, literal("chat", lang="fr")),
            TripleT(S2, P1, blank("b1")),
            TripleT(S2, iri(RDF_TYPE), iri("http://e/T2")),
            TripleT(S2, iri(RDF_TYPE), iri("http://e/T1")),
        ],
    )


def test_filter_patterns(spark):
    gr = g(spark)
    assert gr.filter(s=S1).count() == 3
    assert gr.filter(s=S1, p=P1).count() == 2
    assert gr.filter(o=literal("chat", lang="fr")).count() == 1
    assert gr.filter(o=literal("chat", lang="en")).count() == 0  # structural eq
    assert gr.filter(o=literal("chat")).count() == 0
    assert gr.filter().count() == 6
    # S,P,O full pattern: true membership (NOT the reference's
    # probe-echo bug, indexstore.go:170-194)
    assert gr.filter(S1, P1, literal("v1")).count() == 1
    assert gr.filter(S1, P1, literal("nope")).count() == 0


def test_add_remove_num_squish(spark):
    gr = g(spark)
    extra = TripleGraph.of(spark, [TripleT(S1, P1, literal("v1"))])
    added = gr.add(extra)
    assert added.num() == 7  # bag semantics (liststore.go:37-39)
    assert added.squish().num() == 6  # explicit squish (G14)
    removed = added.remove(extra)
    assert removed.num() == 5  # structural remove drops both copies
    assert removed.filter(S1, P1, literal("v1")).count() == 0


def test_has_subject_get_all(spark):
    gr = g(spark)
    assert gr.has_subject(S1) and gr.has_subject(S2)
    assert not gr.has_subject(iri("http://e/nope"))
    objs = {(t.kind, t.value) for t in gr.get_all(S1, P1)}
    assert objs == {(0, "http://e/o1"), (2, "v1")}
    # get = deterministic minimum by NT form
    t = gr.get(S2, iri(RDF_TYPE))
    assert t.value == "http://e/T1"


def test_first_type_per_subject(spark):
    rows = first_type_per_subject(g(spark).df).collect()
    assert len(rows) == 1
    assert rows[0].type_iri == "http://e/T1"


def test_container_roundtrip(spark):
    members = [iri("http://e/a"), literal("b"), blank("c")]
    df = encode_container(spark, S1, members)
    preds = sorted(r.p_value for r in df.select("p_value").collect())
    assert preds == [f"{RDF}_1", f"{RDF}_2", f"{RDF}_3"]  # 1-based (graph.go:94)
    assert iter_container(df, S1) == members


def test_list_roundtrip(spark):
    members = [literal("x"), literal("y"), iri("http://e/z")]
    head = blank("listhead")
    df = encode_list(spark, head, members)
    assert iter_list(df, head) == members


def test_rewrite_whole_term_replacement(spark):
    gr = g(spark)
    out = rewrite_terms(
        gr.df, r"http://e/(s[0-9]+)", r"http://other/$1", positions=("subject",)
    )
    subs = {r.s_value for r in out.select("s_value").collect()}
    assert subs == {"http://other/s1", "http://other/s2"}


def test_rewrite_blank_node_result_and_literals_untouched(spark):
    gr = TripleGraph.of(
        spark,
        [
            TripleT(S1, P1, iri("http://e/x")),
            TripleT(S1, P1, literal("http://e/x")),  # literal must not change
            TripleT(S1, P1, blank("node7")),
        ],
    )
    # IRI -> blank node when result starts with _: (rdf.go:262-266)
    out = rewrite_terms(gr.df, r"http://e/x", "_:promoted", positions=("object",))
    got = {(r.o_kind, r.o_value) for r in out.select("o_kind", "o_value").collect()}
    assert got == {(1, "promoted"), (2, "http://e/x"), (1, "node7")}
    # blank nodes are matched in their _: form (rdf.go:252-253)
    out2 = rewrite_terms(gr.df, r"^_:node([0-9]+)$", r"http://minted/$1", positions=("object",))
    got2 = {(r.o_kind, r.o_value) for r in out2.select("o_kind", "o_value").collect()}
    assert got2 == {(0, "http://e/x"), (2, "http://e/x"), (0, "http://minted/7")}


def test_rewrite_terms_random_vs_python_re(spark):
    """G13 rewrite equals a Python re oracle (rdf.go:239-284: match
    anywhere -> whole-term template replacement; literals untouched;
    '_:'-results become blank nodes) on randomized term corpora."""
    import random
    import re

    from argo_spark.ops.rewrite import rewrite_terms
    from argo_spark.terms import KIND_BLANK, KIND_IRI, KIND_LITERAL

    pattern = r"http://e/(d|x)([0-9]+)"
    template = r"http://kb/$1/$2"
    py_pat = re.compile(pattern)

    def py_rewrite(kind, value):
        if kind == KIND_LITERAL:
            return kind, value
        term = ("_:" + value) if kind == KIND_BLANK else value
        m = py_pat.search(term)
        if not m:
            return kind, value
        expanded = m.expand(r"http://kb/\1/\2")
        if expanded.startswith("_:"):
            return KIND_BLANK, expanded[2:]
        return KIND_IRI, expanded

    rng = random.Random(11)
    rows = []
    for i in range(120):
        kind = rng.choice([KIND_IRI, KIND_IRI, KIND_BLANK, KIND_LITERAL])
        stem = rng.choice(["http://e/d", "http://e/x", "http://o/n", "plain d"])
        value = f"{stem}{i}" if kind != KIND_BLANK else f"b{i}"
        if i % 7 == 0 and kind == KIND_BLANK:
            value = f"http://e/d{i}"  # '_:http://e/d…' matches mid-term
        rows.append((kind, value, "http://e/p", KIND_IRI, f"http://e/d{i}",
                     None, None))
    df = spark.createDataFrame(
        rows,
        "s_kind tinyint, s_value string, p_value string, "
        "o_kind tinyint, o_value string, o_lang string, o_dt string",
    )
    out = rewrite_terms(df, pattern, template)
    got = [(r.s_kind, r.s_value, r.o_kind, r.o_value) for r in out.collect()]
    want = [
        py_rewrite(sk, sv) + py_rewrite(ok_, ov)
        for (sk, sv, _p, ok_, ov, _l, _d) in rows
    ]
    want = [(a, b, c, d) for (a, b), (c, d) in
            [(w[:2], w[2:]) for w in want]]
    assert sorted(got) == sorted(want)
