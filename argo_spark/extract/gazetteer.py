"""Static entity gazetteer for mention detection + link scoring.

Net-new north-star stage (SURVEY §2.6) — the reference has no
analogue; target IRIs use the DBP/schema.org vocabulary bases the
reference predeclares (/root/reference/namespace.go:70-75).

Deterministic by construction: fixed table, fixed priors, fixed
combined regex, no model weights.
"""

from __future__ import annotations

import re

from argo_spark.namespaces import DBP

# surface form -> (dbpedia resource local name, prior in [0,1])
GAZETTEER: dict[str, tuple[str, float]] = {
    "Ada Lovelace": ("Ada_Lovelace", 0.95),
    "Alan Turing": ("Alan_Turing", 0.95),
    "Grace Hopper": ("Grace_Hopper", 0.94),
    "Tim Berners-Lee": ("Tim_Berners-Lee", 0.93),
    "Barbara Liskov": ("Barbara_Liskov", 0.92),
    "Donald Knuth": ("Donald_Knuth", 0.92),
    "Edsger Dijkstra": ("Edsger_W._Dijkstra", 0.91),
    "John McCarthy": ("John_McCarthy_(computer_scientist)", 0.62),
    "Margaret Hamilton": ("Margaret_Hamilton_(software_engineer)", 0.61),
    "Claude Shannon": ("Claude_Shannon", 0.93),
    "London": ("London", 0.70),
    "Paris": ("Paris", 0.68),
    "Cambridge": ("Cambridge", 0.55),
    "Zurich": ("Z%C3%BCrich", 0.66),
    "Kyoto": ("Kyoto", 0.71),
    "Apache Spark": ("Apache_Spark", 0.90),
    "Hadoop": ("Apache_Hadoop", 0.85),
    "PostgreSQL": ("PostgreSQL", 0.88),
    "Common Crawl": ("Common_Crawl", 0.84),
    "Semantic Web": ("Semantic_Web", 0.83),
}

LINK_THRESHOLD = 0.5

# longest-alternative-first so overlapping forms resolve deterministically
_FORMS = sorted(GAZETTEER, key=len, reverse=True)
MENTION_RE = re.compile(
    r"(?<![A-Za-z0-9])(" + "|".join(re.escape(f) for f in _FORMS) + r")(?![A-Za-z0-9])"
)


def detect_mentions(text: str) -> list[tuple[str, float]]:
    """Scan text for gazetteer mentions; returns deduped, document-order
    (entity_iri, score) pairs above LINK_THRESHOLD.

    Score = prior * surface-match strength (exact case-sensitive match
    = 1.0; the combined regex only produces exact matches, so the prior
    is the score — the hook stays for fuzzier matchers).
    """
    seen: set[str] = set()
    out: list[tuple[str, float]] = []
    for m in MENTION_RE.finditer(text):
        local, prior = GAZETTEER[m.group(1)]
        iri = DBP + local
        score = prior * 1.0
        if score >= LINK_THRESHOLD and iri not in seen:
            seen.add(iri)
            out.append((iri, score))
    return out
