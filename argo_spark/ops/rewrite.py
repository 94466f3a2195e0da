"""Regex term rewriting (SURVEY §2.3 G13) — the ``rdf`` CLI's
``-r/--rewrite[-subject|-predicate|-object]``.

Reference semantics (/root/reference/rdf/rdf.go:239-284): for each
IRI or blank-node term (literals untouched, rdf.go:253-254), if the
regex matches ANYWHERE in the term's string form (blank nodes are
matched as ``_:id``), the ENTIRE term is replaced by the expanded
template — not a substring replacement. A result starting with
``_:`` becomes a blank node (rdf.go:262-266), else an IRI.

Column-expression implementation: ``regexp_extract(term, pat, 0)``
isolates the first match, then ``regexp_replace`` on that exact match
yields the template expansion — all JVM-side, $1-style group refs
work as in the reference (Go Expand vs Java appendReplacement;
divergence only for exotic ``${name}`` templates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from argo_spark.terms import KIND_BLANK, KIND_IRI, KIND_LITERAL


def _rewrite_position(
    kind: Column, value: Column, pattern: str, template: str
) -> tuple[Column, Column]:
    """Rewritten (kind, value) for one triple position."""
    term_str = F.when(kind == KIND_BLANK, F.concat(F.lit("_:"), value)).otherwise(value)
    matched = F.regexp_extract(term_str, pattern, 0)
    expanded = F.regexp_replace(matched, pattern, template)
    hit = (kind != KIND_LITERAL) & term_str.rlike(pattern)
    is_blank_result = expanded.startswith("_:")
    new_kind = F.when(
        hit, F.when(is_blank_result, F.lit(KIND_BLANK)).otherwise(F.lit(KIND_IRI))
    ).otherwise(kind)
    new_value = F.when(
        hit, F.when(is_blank_result, F.substring(expanded, 3, 1 << 30)).otherwise(expanded)
    ).otherwise(value)
    return new_kind.cast("tinyint"), new_value


def rewrite_terms(
    df: DataFrame,
    pattern: str,
    template: str,
    positions: tuple[str, ...] = ("subject", "predicate", "object"),
) -> DataFrame:
    """Apply one rewrite rule to the selected positions of a triples
    DataFrame. Chain calls for multiple rules (applied in order like
    the reference's rewrite list, rdf.go:272-284)."""
    out = df
    if "subject" in positions:
        k, v = _rewrite_position(F.col("s_kind"), F.col("s_value"), pattern, template)
        # simultaneous assignment: v must see the ORIGINAL s_kind
        out = out.withColumns({"s_kind": k, "s_value": v})
    if "predicate" in positions:
        # predicates are IRIs; a '_:'-prefixed result would be illegal RDF
        # but the reference allows it — we keep the IRI slot as-is and
        # only rewrite the value
        matched = F.regexp_extract(F.col("p_value"), pattern, 0)
        expanded = F.regexp_replace(matched, pattern, template)
        out = out.withColumn(
            "p_value",
            F.when(F.col("p_value").rlike(pattern), expanded).otherwise(
                F.col("p_value")
            ),
        )
    if "object" in positions:
        k, v = _rewrite_position(F.col("o_kind"), F.col("o_value"), pattern, template)
        out = out.withColumns({"o_kind": k, "o_value": v})
        # a rewritten object is no longer a literal; lang/dt only apply
        # to literals and literals are never rewritten, so they keep
        # their values (null for non-literals by construction)
    return out
