"""Graph-level relational operators (SURVEY §2.3 G1-G12, G14-G16).

The reference's ``Graph`` (a mutex-guarded Store wrapper,
/root/reference/graph.go:31-50) becomes a thin immutable wrapper over
a triples DataFrame: every mutation returns a new plan, every access
path is a Catalyst-optimizable ``where``. The reference's access-path
dispatch (S / S,P / S,P,O fast paths, indexstore.go:149-167) is
subsumed by predicate pushdown + partition pruning on the stored
table.

Structural-equality semantics throughout — deliberately NOT
reproducing the reference's pointer-identity bugs (GetAll
graph.go:200, filterDefault indexstore.go:241-249, ListStore.Remove
liststore.go:43-48) or the S,P,O probe-echo bug (indexstore.go:170-194).
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argo_spark.namespaces import RDF, RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE
from argo_spark.schema import TRIPLE_COLS, TRIPLES_SCHEMA
from argo_spark.terms import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    Term,
    TripleT,
    triple_nt_col,
)


def triples_from_python(spark: SparkSession, triples: Iterable[TripleT]) -> DataFrame:
    rows = [
        (t.s.kind, t.s.value, t.p.value, t.o.kind, t.o.value, t.o.lang, t.o.dt)
        for t in triples
    ]
    return spark.createDataFrame(rows, TRIPLES_SCHEMA)


def _term_pred(prefix: str, term: Optional[Term]):
    """Filter predicate for one triple position; None = wildcard
    (Graph.Filter semantics, graph.go:169-174)."""
    if term is None:
        return F.lit(True)
    if prefix == "p":
        return F.col("p_value") == term.value
    cond = (F.col(f"{prefix}_kind") == term.kind) & (
        F.col(f"{prefix}_value") == term.value
    )
    if term.kind == KIND_LITERAL:
        lang = term.lang if term.lang else None
        cond = cond & (
            F.col(f"{prefix}_lang").eqNullSafe(F.lit(lang))
            & F.col(f"{prefix}_dt").eqNullSafe(F.lit(term.dt))
        )
    return cond


class TripleGraph:
    """Immutable graph over a triples DataFrame (bag semantics, like
    the reference's stores — dedup is an explicit squish, G14)."""

    def __init__(self, df: DataFrame):
        self.df = df

    @classmethod
    def empty(cls, spark: SparkSession) -> "TripleGraph":
        return cls(spark.createDataFrame([], TRIPLES_SCHEMA))

    @classmethod
    def of(cls, spark: SparkSession, triples: Iterable[TripleT]) -> "TripleGraph":
        return cls(triples_from_python(spark, triples))

    # G1: Add (graph.go:71-81)
    def add(self, other: "TripleGraph") -> "TripleGraph":
        return TripleGraph(self.df.unionByName(other.df.select(*TRIPLE_COLS)))

    # G2: Remove — structural anti-join (graph.go:129-139, fixed semantics)
    def remove(self, other: "TripleGraph") -> "TripleGraph":
        left = self.df.alias("l")
        right = other.df.select(*TRIPLE_COLS).dropDuplicates().alias("r")
        cond = [
            F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")) for c in TRIPLE_COLS
        ]
        return TripleGraph(left.join(right, on=cond, how="left_anti"))

    # G3: Clear (graph.go:142-147)
    def clear(self, spark: SparkSession) -> "TripleGraph":
        return TripleGraph.empty(spark)

    # G4: Num (graph.go:150-155)
    def num(self) -> int:
        return self.df.count()

    # G5: IterTriples (graph.go:159-164) — tests/debug only
    def iter_triples(self):
        for r in self.df.toLocalIterator():
            yield TripleT(
                Term(r.s_kind, r.s_value),
                Term(KIND_IRI, r.p_value),
                Term(r.o_kind, r.o_value, r.o_lang, r.o_dt),
            )

    # G6: Filter(s?, p?, o?) (graph.go:169-174)
    def filter(
        self,
        s: Optional[Term] = None,
        p: Optional[Term] = None,
        o: Optional[Term] = None,
    ) -> DataFrame:
        return self.df.where(
            _term_pred("s", s) & _term_pred("p", p) & _term_pred("o", o)
        )

    # G7: FilterSubset (graph.go:178-182)
    def filter_subset(self, s=None, p=None, o=None) -> "TripleGraph":
        return TripleGraph(self.filter(s, p, o))

    # G8: HasSubject (graph.go:185-193)
    def has_subject(self, s: Term) -> bool:
        return bool(self.df.where(_term_pred("s", s)).limit(1).take(1))

    # G9: Get — first object for (s, p); the reference's "first" is
    # store-iteration-order-dependent (graph.go:210-229); ours is the
    # deterministic minimum by NT form
    def get(self, s: Term, p: Term) -> Optional[Term]:
        rows = (
            self.filter(s, p)
            .orderBy(triple_nt_col())
            .limit(1)
            .select("o_kind", "o_value", "o_lang", "o_dt")
            .take(1)
        )
        if not rows:
            return None
        r = rows[0]
        return Term(r.o_kind, r.o_value, r.o_lang, r.o_dt)

    # G10: GetAll (graph.go:196-206, structural semantics)
    def get_all(self, s: Term, p: Term) -> list[Term]:
        return [
            Term(r.o_kind, r.o_value, r.o_lang, r.o_dt)
            for r in self.filter(s, p)
            .select("o_kind", "o_value", "o_lang", "o_dt")
            .collect()
        ]

    # G14: squish — explicit set semantics over the canonical key
    def squish(self) -> "TripleGraph":
        return TripleGraph(self.df.dropDuplicates(TRIPLE_COLS))

    def nt(self) -> DataFrame:
        return self.df.select(triple_nt_col().alias("value"))


# ---------------------------------------------------------------------------
# G11: RDF containers (graph.go:86-99, 233-252)
# ---------------------------------------------------------------------------

def encode_container(
    spark: SparkSession, subject: Term, members: Sequence[Term]
) -> DataFrame:
    """rdf:_1..rdf:_N membership triples. 1-based like the encoder
    (graph.go:94); the reference's IterContainer starts probing at
    rdf:_0 (graph.go:240) — an off-by-one we do not reproduce."""
    rows = [
        (
            subject.kind,
            subject.value,
            f"{RDF}_{i + 1}",
            m.kind,
            m.value,
            m.lang,
            m.dt,
        )
        for i, m in enumerate(members)
    ]
    return spark.createDataFrame(rows, TRIPLES_SCHEMA)


def iter_container(df: DataFrame, subject: Term) -> list[Term]:
    """Members of a container in rdf:_N order."""
    rows = (
        df.where(
            (F.col("s_kind") == subject.kind)
            & (F.col("s_value") == subject.value)
            & F.col("p_value").rlike(f"^{RDF}_[0-9]+$")
        )
        .withColumn(
            "n", F.regexp_extract("p_value", r"_([0-9]+)$", 1).cast("int")
        )
        .orderBy("n")
        .select("o_kind", "o_value", "o_lang", "o_dt")
        .collect()
    )
    return [Term(r.o_kind, r.o_value, r.o_lang, r.o_dt) for r in rows]


# ---------------------------------------------------------------------------
# G12: RDF lists (graph.go:103-126, 255-271)
# ---------------------------------------------------------------------------

def encode_list(
    spark: SparkSession,
    head: Term,
    members: Sequence[Term],
    skolem_prefix: str = "list",
) -> DataFrame:
    """rdf:first/rdf:rest cons cells. The reference mints random anon
    nodes for the tail cells (graph.go:103-126); we skolemize them as
    ``{skolem_prefix}-{i}`` off the head term — deterministic."""
    rows = []
    cur = head
    for i, m in enumerate(members):
        rows.append((cur.kind, cur.value, RDF_FIRST, m.kind, m.value, m.lang, m.dt))
        if i + 1 < len(members):
            nxt = Term(KIND_BLANK, f"{skolem_prefix}-{head.value}-{i + 1}")
        else:
            nxt = Term(KIND_IRI, RDF_NIL)
        rows.append((cur.kind, cur.value, RDF_REST, nxt.kind, nxt.value, None, None))
        cur = nxt
    return spark.createDataFrame(rows, TRIPLES_SCHEMA)


def iter_list(df: DataFrame, head: Term, max_len: int = 10_000) -> list[Term]:
    """Walk a cons list back. Lists are short (the reference walks by
    pointer chasing, graph.go:255-271); a driver-side loop over indexed
    lookups is the honest physical plan here — a scalable variant for
    MANY lists at once would be an iterative self-join keyed by head."""
    firsts = {}
    rests = {}
    for r in df.where(
        F.col("p_value").isin([RDF_FIRST, RDF_REST])
    ).collect():
        key = (r.s_kind, r.s_value)
        if r.p_value == RDF_FIRST:
            firsts[key] = Term(r.o_kind, r.o_value, r.o_lang, r.o_dt)
        else:
            rests[key] = Term(r.o_kind, r.o_value)
    out = []
    cur = head
    while (cur.kind, cur.value) in firsts and len(out) < max_len:
        out.append(firsts[(cur.kind, cur.value)])
        nxt = rests.get((cur.kind, cur.value))
        if nxt is None or (nxt.kind == KIND_IRI and nxt.value == RDF_NIL):
            break
        cur = nxt
    return out


# ---------------------------------------------------------------------------
# First-type-per-subject (the RDF/XML writer's "first rdf:type wins",
# rdfxml.go:189-198) — deterministic min_by instead of iteration order.
# ---------------------------------------------------------------------------

def first_type_per_subject(df: DataFrame) -> DataFrame:
    return (
        df.where((F.col("p_value") == RDF_TYPE) & (F.col("o_kind") == KIND_IRI))
        .groupBy("s_kind", "s_value")
        .agg(F.min("o_value").alias("type_iri"))
    )
