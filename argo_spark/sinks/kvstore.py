"""KV-indexed triple store (SURVEY §2.2 K7): the reference's
RedisStore — /root/reference/redisstore/redisstore.go:29-90 — with the
client made pluggable (no Redis endpoint in this sandbox; a real
``redis.Redis`` drops in unchanged, an in-memory client serves tests).

Indexing scheme replicated exactly:

* term key = FNV-1 64-bit of the NT lexical form, hex-encoded
  (redisstore.go:29-33; Go ``fnv.New64()`` is FNV-1, not FNV-1a);
* three composite-key permutation sets — ``sp<hs><hp>`` holds object
  NT forms, ``so<hs><ho>`` predicates, ``po<hp><ho>`` subjects
  (SADD/SREM, redisstore.go:45-75);
* a ``triples`` list of NT lines (RPUSH/LREM; LLEN = Num).

Beyond the reference (whose Iter/Filter return nil,
redisstore.go:84-90): ``iter_triples``/``filter`` are implemented via
the composite sets, and ``bulk_add_dataframe`` loads a triples
DataFrame executor-side (one client per partition) — the path a real
cluster would use against a Redis farm.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame

from argo_spark.ntriples import parse_document
from argo_spark.terms import Term, TripleT, format_term, format_triple

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv1_64(data: bytes) -> int:
    """FNV-1 64-bit (multiply THEN xor — Go hash/fnv New64)."""
    h = _FNV_OFFSET
    for b in data:
        h = (h * _FNV_PRIME) & _MASK64
        h ^= b
    return h


def hash_term(t: Term) -> str:
    """redisstore.go:29-33 HashTerm: FNV-1 64 of Term.String(), hex."""
    return format(fnv1_64(format_term(t).encode("utf-8")), "016x")


class InMemoryKV:
    """Minimal Redis-shaped client: the subset the store issues."""

    def __init__(self):
        self.sets: dict[str, set] = {}
        self.lists: dict[str, list] = {}

    def sadd(self, key: str, member: str) -> None:
        self.sets.setdefault(key, set()).add(member)

    def srem(self, key: str, member: str) -> None:
        self.sets.get(key, set()).discard(member)

    def smembers(self, key: str) -> set:
        return set(self.sets.get(key, ()))

    def rpush(self, key: str, value: str) -> None:
        self.lists.setdefault(key, []).append(value)

    def lrem(self, key: str, count: int, value: str) -> None:
        lst = self.lists.get(key, [])
        if count == 0:
            self.lists[key] = [v for v in lst if v != value]
        else:  # pragma: no cover - reference only uses count=0
            raise NotImplementedError("only count=0 removal is used")

    def llen(self, key: str) -> int:
        return len(self.lists.get(key, []))

    def lrange(self, key: str, start: int, stop: int) -> list:
        lst = self.lists.get(key, [])
        stop = len(lst) if stop == -1 else stop + 1
        return lst[start:stop]

    def flushdb(self) -> None:
        self.sets.clear()
        self.lists.clear()


class KVTripleStore:
    """The reference RedisStore API over any Redis-shaped client."""

    def __init__(self, client=None):
        self.client = client if client is not None else InMemoryKV()

    # -- reference API (redisstore.go:45-90) --------------------------------

    def add(self, t: TripleT) -> None:
        hs, hp, ho = hash_term(t.s), hash_term(t.p), hash_term(t.o)
        c = self.client
        c.sadd("sp" + hs + hp, format_term(t.o))
        c.sadd("so" + hs + ho, format_term(t.p))
        c.sadd("po" + hp + ho, format_term(t.s))
        c.rpush("triples", format_triple(t.s, t.p, t.o))

    def remove(self, t: TripleT) -> None:
        hs, hp, ho = hash_term(t.s), hash_term(t.p), hash_term(t.o)
        c = self.client
        c.srem("sp" + hs + hp, format_term(t.o))
        c.srem("so" + hs + ho, format_term(t.p))
        c.srem("po" + hp + ho, format_term(t.s))
        c.lrem("triples", 0, format_triple(t.s, t.p, t.o))

    def clear(self) -> None:
        self.client.flushdb()

    def num(self) -> int:
        return self.client.llen("triples")

    # -- implemented here (nil in the reference, redisstore.go:84-90) -------

    def iter_triples(self) -> Iterator[TripleT]:
        for line in self.client.lrange("triples", 0, -1):
            triples, err = parse_document(line)
            if err is None and triples:
                yield triples[0]

    def filter(
        self,
        s: Optional[Term] = None,
        p: Optional[Term] = None,
        o: Optional[Term] = None,
    ) -> Iterator[TripleT]:
        """Pattern filter using the composite-key sets when two terms
        are bound (a single O(1) set lookup — the scheme's purpose);
        full scan otherwise."""
        c = self.client
        if s is not None and p is not None and o is None:
            for o_nt in sorted(c.smembers("sp" + hash_term(s) + hash_term(p))):
                yield TripleT(s, p, _parse_term(o_nt))
            return
        if s is not None and o is not None and p is None:
            for p_nt in sorted(c.smembers("so" + hash_term(s) + hash_term(o))):
                yield TripleT(s, _parse_term(p_nt), o)
            return
        if p is not None and o is not None and s is None:
            for s_nt in sorted(c.smembers("po" + hash_term(p) + hash_term(o))):
                yield TripleT(_parse_term(s_nt), p, o)
            return
        for t in self.iter_triples():
            if (
                (s is None or t.s == s)
                and (p is None or t.p == p)
                and (o is None or t.o == o)
            ):
                yield t


def _parse_term(nt: str) -> Term:
    """One NT term lexical form -> Term (reuses the NT line parser)."""
    triples, err = parse_document(f"<x:s> <x:p> {nt} .")
    if err is None and triples:
        return triples[0].o
    # subject-position forms (blank nodes) parse via a different slot
    triples, err = parse_document(f"{nt} <x:p> <x:o> .")
    if err is None and triples:
        return triples[0].s
    raise ValueError(f"unparseable NT term: {nt!r}")


def bulk_add_dataframe(
    df: DataFrame, client_factory: Callable[[], object]
) -> None:
    """Executor-side bulk load: one client per partition (the pattern
    for loading a Spark triples table into a Redis farm — the
    reference's Add loop, distributed). ``client_factory`` must be
    picklable and is invoked on the executor."""
    from argo_spark.terms import KIND_IRI as _KIND_IRI
    from argo_spark.terms import Term as _Term

    def load(rows):
        store = KVTripleStore(client_factory())
        for r in rows:
            store.add(
                TripleT(
                    _Term(r.s_kind, r.s_value),
                    _Term(_KIND_IRI, r.p_value),
                    _Term(r.o_kind, r.o_value, r.o_lang, r.o_dt),
                )
            )

    df.foreachPartition(load)
