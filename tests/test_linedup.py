"""Repeated-line (C4-style boilerplate) removal (ops/linedup.py)."""

from argo_spark.ops.linedup import remove_repeated_lines, repeated_lines


def test_remove_repeated_lines(spark):
    rows = [
        (1, "unique one\nCOOKIE BANNER\nalpha", "a"),
        (2, "unique two\nCOOKIE BANNER\nbeta", "a"),
        (3, "COOKIE BANNER", "b"),
        (4, "plain doc", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = remove_repeated_lines(df, min_docs=2)
    got = {r.doc_id: (r.text, r.src) for r in out.collect()}
    assert got == {
        1: ("unique one\nalpha", "a"),
        2: ("unique two\nbeta", "a"),
        3: ("", "b"),          # fully-boilerplate doc survives, empty
        4: ("plain doc", "b"),
    }
    # frequency view
    freq = {r.line: r.n_docs for r in repeated_lines(df, min_docs=2).collect()}
    assert freq == {"COOKIE BANNER": 3}


def test_remove_repeated_lines_within_doc_repeat(spark):
    # a line repeated only WITHIN one doc is not corpus-boilerplate
    # (countDistinct on doc ids) and is kept, both copies, in order
    df = spark.createDataFrame(
        [(1, "x\nx\ny", "s"), (2, "z", "s")],
        "doc_id long, text string, src string",
    )
    out = remove_repeated_lines(df, min_docs=2)
    got = {r.doc_id: r.text for r in out.collect()}
    assert got == {1: "x\nx\ny", 2: "z"}


def test_remove_repeated_lines_order_stability(spark):
    # reassembly is position-ordered regardless of partitioning
    text = "\n".join(f"l{i}" for i in range(50))
    df = spark.createDataFrame(
        [(i, text if i == 0 else f"u{i}", "s") for i in range(4)],
        "doc_id long, text string, src string",
    ).repartition(8)
    out = remove_repeated_lines(df, min_docs=2)
    assert {r.doc_id: r.text for r in out.collect()}[0] == text
