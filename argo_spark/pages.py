"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §1).

Generates the pipeline input table ``(url, warc_ts, html, text, lang)``
plus the golden ``pages_expected_triples`` used for P/R scoring. Every
page is a pure function of (seed, page_id), so generation distributes
over Spark (``spark.range(n)`` + Arrow batches) and is identical at
any parallelism — no driver-side materialization, no external data.

The embedded RDFa exercises the full attribute set the reference walk
handles (/root/reference/rdfaparser/rdfaparser.go:64-152): ``vocab``,
``typeof`` (with and without ``resource`` — the latter exercising
skolemized anon subjects), ``property`` with ``content``/child-text/
``datatype``/``xml:lang``, ``rel``/``rev`` + ``href``, and ``xmlns:*``
prefix declarations whose document-global scoping quirk is reproduced.
Entity IRIs are drawn from a pool with spelling variants so MinHash-LSH
entity dedup has real work to do.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from typing import Iterable, Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from argo_spark.extract.gazetteer import detect_mentions
from argo_spark.extract.rdfa import MENTIONS_PRED, FlatTriple
from argo_spark.namespaces import DBP, RDF_TYPE, SCHEMA, XSD, FOAF
from argo_spark.terms import KIND_BLANK, KIND_IRI, KIND_LITERAL, skolem_id

EPOCH = datetime(2024, 1, 1)

# entity pool: (name, type, iri variant local-names — first is canonical)
ENTITY_POOL: List[Tuple[str, str, List[str]]] = [
    ("Ada Lovelace", "Person", ["Ada_Lovelace", "Ada_Lovelace_(mathematician)"]),
    ("Alan Turing", "Person", ["Alan_Turing", "Alan_M._Turing"]),
    ("Grace Hopper", "Person", ["Grace_Hopper", "Grace_Murray_Hopper"]),
    ("Barbara Liskov", "Person", ["Barbara_Liskov"]),
    ("Donald Knuth", "Person", ["Donald_Knuth", "Donald_E._Knuth"]),
    ("Claude Shannon", "Person", ["Claude_Shannon"]),
    ("London", "Place", ["London", "London_(England)"]),
    ("Paris", "Place", ["Paris", "Paris_(France)"]),
    ("Kyoto", "Place", ["Kyoto"]),
    ("Apache Spark", "Organization", ["Apache_Spark"]),
    ("Common Crawl", "Organization", ["Common_Crawl", "CommonCrawl"]),
    ("Semantic Web", "Organization", ["Semantic_Web"]),
]

_FILLER = (
    "graph pipeline crawl page engine data web table scan filter merge "
    "shuffle batch stream column row value index store query plan vector "
    "token corpus sample archive snapshot record field entity link node"
).split()

_JOBS = ["mathematician", "engineer", "admiral", "professor", "researcher"]
_LANGS = ["en", "fr", "de", "es"]


def _ts(page_id: int) -> datetime:
    return EPOCH + timedelta(seconds=(page_id * 37) % 86_400, days=page_id % 300)


def _url(page_id: int) -> str:
    return f"http://site{page_id % 97}.example.org/page/{page_id}"


def gen_page(page_id: int, seed: int = 42):
    """Build one page. Returns (url, warc_ts, html, text, lang, triples)."""
    rng = random.Random(f"{seed}:{page_id}")
    url = _url(page_id)
    warc_ts = _ts(page_id)
    lang = rng.choice(_LANGS)
    skolem_key = f"{url}\x1f{warc_ts}"

    triples: List[FlatTriple] = []
    texts: List[str] = []  # visible text snippets in document order
    body: List[str] = []
    anon_ordinal = 0

    def t(s_kind, s_value, p, o_kind, o_value, o_lang=None, o_dt=None):
        triples.append((s_kind, s_value, p, o_kind, o_value, o_lang, o_dt))

    title = f"notes on {rng.choice(_FILLER)} {rng.choice(_FILLER)} {page_id}"
    texts.append(title)

    intro_words = [rng.choice(_FILLER) for _ in range(rng.randint(25, 60))]
    n_mentions = rng.randint(0, 3)
    mention_names = rng.sample([e[0] for e in ENTITY_POOL], n_mentions)
    for name in mention_names:
        intro_words.insert(rng.randrange(len(intro_words)), name)
    intro = " ".join(intro_words)
    texts.append(intro)
    body.append(f"<p>{intro}</p>")

    # entity blocks
    for _ in range(rng.randint(1, 4)):
        name, etype, variants = rng.choice(ENTITY_POOL)
        kind = rng.random()
        if kind < 0.2:
            # anonymous subject: typeof without resource
            subj_kind, subj = KIND_BLANK, skolem_id(skolem_key, "", anon_ordinal)
            anon_ordinal += 1
            res_attr = ""
        else:
            iri = DBP + rng.choice(variants)
            subj_kind, subj = KIND_IRI, iri
            res_attr = f' resource="{iri}"'

        block = [f'<div vocab="{SCHEMA}" typeof="{etype}"{res_attr}>']
        t(subj_kind, subj, RDF_TYPE, KIND_IRI, SCHEMA + etype)

        # name via child text
        block.append(f'<span property="name">{name}</span>')
        t(subj_kind, subj, SCHEMA + "name", KIND_LITERAL, name)
        texts.append(name)

        if etype == "Person":
            job = rng.choice(_JOBS)
            block.append(f'<span property="jobTitle" content="{job}"></span>')
            t(subj_kind, subj, SCHEMA + "jobTitle", KIND_LITERAL, job)

            y = rng.randint(1800, 1990)
            block.append(
                f'<time property="birthDate" datatype="{XSD}date" content="{y}-01-02"></time>'
            )
            t(subj_kind, subj, SCHEMA + "birthDate", KIND_LITERAL, f"{y}-01-02", None, XSD + "date")

        if rng.random() < 0.5:
            desc = f"profil de {name.lower()}"
            block.append(f'<span property="description" xml:lang="fr">{desc}</span>')
            t(subj_kind, subj, SCHEMA + "description", KIND_LITERAL, desc, "fr", None)
            texts.append(desc)

        if rng.random() < 0.6:
            home = f"http://{variants[0].lower().replace('%', '')}.example.com/"
            block.append(f'<a rel="url" href="{home}">homepage</a>')
            t(subj_kind, subj, SCHEMA + "url", KIND_IRI, home)
            texts.append("homepage")

        if rng.random() < 0.3:
            other = f"http://site{rng.randint(0, 96)}.example.org/page/{rng.randint(0, 10_000)}"
            block.append(f'<a rev="subjectOf" href="{other}">reference</a>')
            t(KIND_IRI, other, SCHEMA + "subjectOf", subj_kind, subj)
            texts.append("reference")

        block.append("</div>")
        body.append("".join(block))

        # duplicated block → identical triples; exercises the squish
        if subj_kind == KIND_IRI and rng.random() < 0.15:
            body.append(
                f'<div vocab="{SCHEMA}" typeof="{etype}" resource="{subj}">'
                f'<span property="name">{name}</span></div>'
            )
            t(subj_kind, subj, RDF_TYPE, KIND_IRI, SCHEMA + etype)
            t(subj_kind, subj, SCHEMA + "name", KIND_LITERAL, name)
            texts.append(name)

    # CURIE block with document-global xmlns binding (rdfaparser.go:66-73)
    if rng.random() < 0.5:
        name, _, variants = rng.choice(ENTITY_POOL)
        iri = DBP + variants[0]
        friend_name, _, fvariants = rng.choice(ENTITY_POOL)
        friend = DBP + fvariants[0]
        body.append(
            f'<div xmlns:foaf="{FOAF}">'
            f'<div typeof="foaf:Agent" resource="{iri}">'
            f'<span property="foaf:name">{name}</span>'
            f'<a rel="foaf:knows" href="{friend}">{friend_name}</a>'
            f"</div></div>"
        )
        t(KIND_IRI, iri, RDF_TYPE, KIND_IRI, FOAF + "Agent")
        t(KIND_IRI, iri, FOAF + "name", KIND_LITERAL, name)
        t(KIND_IRI, iri, FOAF + "knows", KIND_IRI, friend)
        texts.append(name)
        texts.append(friend_name)

    # page-level metadata on the document URI (initial subject)
    doc_lang_note = f"document in {lang}"
    # NB a full IRI in @property would be mangled by the reference's
    # expandURI (the part before ':' is taken as a prefix,
    # rdfaparser.go:53-62) — so bind vocab locally and use a bare name.
    body.append(
        f'<p vocab="{SCHEMA}" property="inLanguage" content="{lang}">{doc_lang_note}</p>'
    )
    t(KIND_IRI, url, SCHEMA + "inLanguage", KIND_LITERAL, lang)
    texts.append(doc_lang_note)

    xml_decl = '<?xml version="1.0" encoding="UTF-8"?>' if rng.random() < 0.2 else ""
    html = (
        f"{xml_decl}<!DOCTYPE html>"
        f'<html lang="{lang}"><head><title>{title}</title>'
        f"<script>var t={page_id};</script><style>.m{{color:red}}</style></head>"
        f"<body><nav><a href=\"/\">home</a> <a href=\"/about\">about</a></nav>"
        f"<header><h1>{title}</h1></header>"
        f"<main>{''.join(body)}</main>"
        f"<footer>generated corpus page</footer></body></html>"
    )

    text = " ".join(" ".join(texts).split())

    # mention triples over the stripped text (same pure detector the
    # extractor uses; unit tests pin the detector independently)
    for iri, _score in detect_mentions(text):
        t(KIND_IRI, url, MENTIONS_PRED, KIND_IRI, iri)

    return url, warc_ts, html.encode("utf-8"), text, lang, triples


PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"
EXPECTED_DDL = (
    "s_kind tinyint, s_value string, p_value string, o_kind tinyint, "
    "o_value string, o_lang string, o_dt string, url string, warc_ts timestamp"
)


def _pages_batches(batches: Iterable[pd.DataFrame], seed: int) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [gen_page(int(i), seed)[:5] for i in pdf["id"]]
        yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def _expected_batches(batches: Iterable[pd.DataFrame], seed: int) -> Iterator[pd.DataFrame]:
    cols = ["s_kind", "s_value", "p_value", "o_kind", "o_value", "o_lang", "o_dt", "url", "warc_ts"]
    for pdf in batches:
        rows = []
        for i in pdf["id"]:
            url, warc_ts, _html, _text, _lang, triples = gen_page(int(i), seed)
            for t in triples:
                rows.append(t + (url, warc_ts))
        yield pd.DataFrame(rows, columns=cols)


def synthesize_pages(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    rng_src = spark.range(0, n, numPartitions=partitions) if partitions else spark.range(n)
    return rng_src.mapInPandas(lambda b: _pages_batches(b, seed), schema=PAGES_DDL)


def expected_triples(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    rng_src = spark.range(0, n, numPartitions=partitions) if partitions else spark.range(n)
    return rng_src.mapInPandas(lambda b: _expected_batches(b, seed), schema=EXPECTED_DDL)
