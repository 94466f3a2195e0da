"""Dedup family: exact, MinHash-LSH, SimHash, connected components,
and the north-star entity dedup + winner rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from argo_spark.namespaces import DBP, RDF_TYPE, SCHEMA
from argo_spark.ops.dedup import (
    apply_entity_mapping,
    connected_components,
    entity_dedup_mapping,
    exact_dedup,
    minhash_dedup_pairs,
    simhash_candidate_pairs,
)
from argo_spark.ops.graph import TripleGraph
from argo_spark.terms import TripleT, iri, literal

BASE = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor incididunt ut labore et dolore magna aliqua"


def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("dolor", "color")),  # near dup of 0
        (3, "completely different text about spark dataframes and shuffles here"),
        (4, "the quick brown fox jumps over the lazy dog again and again and again"),
        (5, BASE + " extra trailing words appended"),  # near dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    out = exact_dedup(docs(spark), ["text"], "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [0, 2, 3, 4, 5]


def test_minhash_pairs_find_near_dups(spark):
    pairs = minhash_dedup_pairs(docs(spark), "doc_id", "text", threshold=0.4)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert (0, 1) in got  # exact dup
    assert (0, 5) in got or (1, 5) in got  # near dup
    # unrelated docs never pair
    assert not any(3 in p or 4 in p for p in got)


def test_simhash_pairs(spark):
    pairs = simhash_candidate_pairs(docs(spark), "doc_id", "text")
    got = {(r.a, r.b): r.hamming for r in pairs.collect()}
    assert got[(0, 1)] == 0  # identical text, identical simhash
    near = [h for (a, b), h in got.items() if (a, b) in {(0, 5), (1, 5)}]
    assert near and min(near) <= 16


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y"), ("z", "z2")], "a string, b string"
    )
    comps = {r.id: r.comp for r in connected_components(edges).collect()}
    assert comps["a"] == comps["b"] == comps["c"] == "a"
    assert comps["x"] == comps["y"] == "x"
    assert comps["z"] == comps["z2"] == "z"


def test_entity_dedup_and_rewrite(spark):
    ada1 = DBP + "Ada_Lovelace"
    ada2 = DBP + "Ada_Lovelace_(mathematician)"
    turing = DBP + "Alan_Turing"
    gr = TripleGraph.of(
        spark,
        [
            TripleT(iri(ada1), iri(SCHEMA + "name"), literal("Ada Lovelace")),
            TripleT(iri(ada2), iri(SCHEMA + "name"), literal("Ada Lovelace")),
            TripleT(iri(turing), iri(SCHEMA + "name"), literal("Alan Turing")),
            TripleT(iri(ada2), iri(RDF_TYPE), iri(SCHEMA + "Person")),
            TripleT(iri("http://e/doc"), iri(SCHEMA + "mentions"), iri(ada2)),
        ],
    )
    mapping = entity_dedup_mapping(gr.df)
    m = {r.entity: r.canonical for r in mapping.collect()}
    assert m == {ada2: ada1}  # variant folded into min IRI; Turing untouched

    rewritten = apply_entity_mapping(gr.df, mapping)
    subs = {r.s_value for r in rewritten.select("s_value").collect()}
    assert ada2 not in subs and ada1 in subs
    objs = {r.o_value for r in rewritten.where(F.col("o_kind") == 0).collect()}
    assert ada2 not in objs
    # literals untouched
    names = {r.o_value for r in rewritten.where(F.col("o_kind") == 2).collect()}
    assert "Ada Lovelace" in names
    assert rewritten.count() == gr.df.count()


def test_connected_components_random_graphs_vs_union_find(spark):
    """CC equals a driver-side union-find oracle on seeded random
    graphs (CC underpins every dedup consumer)."""
    import random

    for seed in range(5):
        rng = random.Random(seed)
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 80))
        ]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        touched = {v for e in edges for v in e}
        expected = {}
        for v in touched:
            expected.setdefault(find(v), set()).add(v)
        want = {frozenset(m) for m in expected.values()}

        df = spark.createDataFrame(edges, "a long, b long")
        got_rows = connected_components(df).collect()
        by_comp: dict = {}
        for r in got_rows:
            by_comp.setdefault(r.comp, set()).add(r.id)
        got = {frozenset(m) for m in by_comp.values()}
        assert got == want, f"seed {seed}"


def test_minhash_exact_duplicate_recall_random(spark):
    """Planted EXACT duplicates must always pair (identical signature
    => identical buckets), in both pair modes, on random corpora."""
    import random

    for seed in range(3):
        rng = random.Random(seed)
        words = [f"w{i}" for i in range(40)]
        rows, dup_pairs = [], []
        doc_id = 0
        for d in range(12):
            text = " ".join(rng.choice(words) for _ in range(30))
            rows.append((doc_id, text))
            if d % 3 == 0:  # plant an exact duplicate
                rows.append((doc_id + 100, text))
                dup_pairs.append((doc_id, doc_id + 100))
            doc_id += 1
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        for mode in ("pairs", "star"):
            pairs = minhash_dedup_pairs(
                docs, "doc_id", "text", threshold=0.99, pair_mode=mode
            )
            comps = {r.id: r.comp for r in
                     connected_components(pairs.select("a", "b")).collect()}
            for a, b in dup_pairs:
                assert comps.get(a) is not None and comps.get(a) == comps.get(b), (
                    f"seed {seed} mode {mode}: exact dup ({a},{b}) not merged"
                )


def test_driver_entity_mapping_equals_distributed(spark):
    """The driver-side fast path must reproduce the distributed
    entity-dedup mapping EXACTLY (same xxhash64, permutations, band
    keys, hubs, Jaccard, min-label components) on the real synthetic
    corpus triples."""
    from argo_spark.extract.rdfa import extract_triples_df
    from argo_spark.ops.dedup import entity_dedup_mapping
    from argo_spark.pages import synthesize_pages
    from argo_spark.schema import TRIPLE_COLS

    triples = extract_triples_df(synthesize_pages(spark, 400)).select(
        *TRIPLE_COLS
    ).persist()
    fast = entity_dedup_mapping(triples)  # default: driver path
    slow = entity_dedup_mapping(triples, driver_max_entities=None)
    f = {(r.entity, r.canonical) for r in fast.collect()}
    s = {(r.entity, r.canonical) for r in slow.collect()}
    assert f == s and len(f) > 0, (sorted(f - s)[:3], sorted(s - f)[:3])
    triples.unpersist()


def test_python_xxhash_matches_spark(spark):
    """Bit-parity of argo_spark.xxhash with F.xxhash64 for the three
    paths the driver fast path uses (string / long / int-literal
    chain)."""
    import random
    import string as _string

    from pyspark.sql import functions as F

    from argo_spark.xxhash import (
        spark_xxhash64,
        xxh64_int,
        xxh64_long,
        xxh64_string,
    )

    rnd = random.Random(13)
    strs = ["", "a", "é中λ", "x" * 32,
            *("".join(rnd.choices(_string.printable, k=rnd.randint(0, 48)))
              for _ in range(25))]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    for r in df.select("s", F.xxhash64("s").alias("h")).collect():
        assert xxh64_string(r.s) == r.h
    longs = [0, -1, 2**62, *(rnd.randint(-2**63, 2**63 - 1) for _ in range(15))]
    df = spark.createDataFrame([(v,) for v in longs], "v long")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert xxh64_long(r.v) == r.h
    rows = [(rnd.randint(0, 7), rnd.randint(0, 2**31 - 1), rnd.randint(0, 2**31 - 1))
            for _ in range(15)]
    df = spark.createDataFrame(rows, "b int, m1 long, m2 long")
    for r in df.select("*", F.xxhash64("b", "m1", "m2").alias("h")).collect():
        assert spark_xxhash64(r.b, r.m1, r.m2,
                              int_width=("int", "long", "long")) == r.h
    assert xxh64_int(7) != xxh64_long(7)  # width matters, like Spark
