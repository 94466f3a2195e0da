"""Dictionary-encoded triples (SURVEY §2.2 K6).

The reference's MySQL store dictionary-encodes terms into surrogate
int ids with autoincrement + write-through caches
(/root/reference/mysqlstore/mysqlstore.go:219-296,348-412). Serial
autoincrement doesn't parallelize; the surrogate key here is
``xxhash64`` of the term's canonical NT lexical form — deterministic
on any executor, no coordination, collision probability ~n²/2⁶⁵
(≈1e-7 at 10¹² terms; the id embeds no semantics so a collision only
merges two terms' storage, detectable by the dictionary's
count-distinct check).

The reference also splits predicates into (prefix, local) via
SplitPrefix (mysqlstore.go:388-391) — kept as an optional predicate
dictionary column pair. Encoded triples are ~3 longs per row: the
compact shape for MinHash joins and for bucketed/sorted storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from argo_spark.namespaces import split_prefix_base, split_prefix_local
from argo_spark.terms import term_nt_col

ID_COLS = ("s_id", "p_id", "o_id")


def _default_id_fn(nt):
    return F.xxhash64(nt)


def _term_id(kind, value, lang=None, dt=None, id_fn=None):
    return (id_fn or _default_id_fn)(term_nt_col(kind, value, lang, dt))


def term_dictionary(triples: DataFrame, id_fn=None) -> DataFrame:
    """Distinct terms from all three positions:
    (term_id, kind, value, lang, dt, nt) — the decode side.

    ``id_fn`` overrides the surrogate derivation (NT column -> id
    column); default xxhash64-of-NT. A portable md5-based fn makes the
    encoding DuckDB-replayable for oracle contracts — pass the SAME fn
    to :func:`encode_triples` or decode joins will miss."""
    s = triples.select(
        F.col("s_kind").alias("kind"), F.col("s_value").alias("value"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("dt"),
    )
    p = triples.select(
        F.lit(0).cast("tinyint").alias("kind"), F.col("p_value").alias("value"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("dt"),
    )
    o = triples.select(
        F.col("o_kind").alias("kind"), F.col("o_value").alias("value"),
        F.col("o_lang").alias("lang"), F.col("o_dt").alias("dt"),
    )
    terms = s.unionByName(p).unionByName(o).dropDuplicates()
    nt = term_nt_col(F.col("kind"), F.col("value"), F.col("lang"), F.col("dt"))
    return terms.select(
        (id_fn or _default_id_fn)(nt).alias("term_id"), "kind", "value", "lang", "dt",
        nt.alias("nt"),
        # the mysqlstore predicate split, available for any IRI term
        split_prefix_base(F.col("value")).alias("prefix_base"),
        split_prefix_local(F.col("value")).alias("local_name"),
    )


def encode_triples(
    triples: DataFrame, keep: tuple[str, ...] = (), id_fn=None
) -> DataFrame:
    """(s_id, p_id, o_id, *keep) — pure projection, no join, no
    shuffle: ids are recomputable hashes, not lookups. ``id_fn`` must
    match the one given to :func:`term_dictionary`."""
    return triples.select(
        _term_id(F.col("s_kind"), F.col("s_value"), id_fn=id_fn).alias("s_id"),
        _term_id(F.lit(0), F.col("p_value"), id_fn=id_fn).alias("p_id"),
        _term_id(
            F.col("o_kind"), F.col("o_value"), F.col("o_lang"), F.col("o_dt"),
            id_fn=id_fn,
        ).alias("o_id"),
        *[F.col(c) for c in keep],
    )


def decode_triples(encoded: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Encoded ids back to the flattened triple schema via three
    dictionary joins (Catalyst broadcasts when the dictionary is
    small; bucket both sides by term_id at warehouse scale)."""
    d = dictionary.select("term_id", "kind", "value", "lang", "dt")

    def j(df, id_col, prefix):
        dd = d.select(
            F.col("term_id").alias(id_col),
            F.col("kind").alias(f"{prefix}_kind_"),
            F.col("value").alias(f"{prefix}_value_"),
            F.col("lang").alias(f"{prefix}_lang_"),
            F.col("dt").alias(f"{prefix}_dt_"),
        )
        return df.join(dd, id_col, "left")

    out = j(j(j(encoded, "s_id", "s"), "p_id", "p"), "o_id", "o")
    return out.select(
        F.col("s_kind_").alias("s_kind"),
        F.col("s_value_").alias("s_value"),
        F.col("p_value_").alias("p_value"),
        F.col("o_kind_").alias("o_kind"),
        F.col("o_value_").alias("o_value"),
        F.col("o_lang_").alias("o_lang"),
        F.col("o_dt_").alias("o_dt"),
        *[c for c in encoded.columns if c not in ID_COLS],
    )
