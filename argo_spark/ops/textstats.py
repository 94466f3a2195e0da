"""Text analysis operators for training-data pipelines (driver brief):
language-ID, quality scoring, token counting, document fingerprinting.

All pure column expressions (JVM-side, whole-stage codegen) — these
run over every document at 100 TB, so no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "dans"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "nicht"],
    "es": ["el", "la", "los", "de", "que", "y", "es", "con"],
}


def tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"[^a-zA-Z0-9']+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    """Whitespace/punct token count (the BPE-ish proxy: word pieces)."""
    return F.size(tokens(col))


def lang_id(col: Column) -> Column:
    """Stopword-vote language ID: argmax over per-language hit counts;
    'und' when nothing matches."""
    toks = tokens(col)
    scores = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))
                ).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, ws in _LANG_STOPWORDS.items()
        ]
    )
    best = F.array_max(scores)
    return F.when(best.hits > 0, best.lang).otherwise(F.lit("und"))


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality score from surface statistics:
    length band, alpha ratio, punctuation ratio, mean word length —
    the usual web-text heuissue heuristics, fixed weights."""
    length = F.length(col)
    n_alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(col, r"[^!-/:-@\[-`{-~]", ""))
    n_tok = token_count(col)
    alpha_ratio = n_alpha / F.greatest(length, F.lit(1))
    punct_ratio = n_punct / F.greatest(length, F.lit(1))
    mean_wordlen = length / F.greatest(n_tok, F.lit(1))
    len_score = F.least(length / F.lit(500.0), F.lit(1.0))
    word_score = F.when((mean_wordlen >= 3) & (mean_wordlen <= 12), 1.0).otherwise(0.3)
    score = (
        0.3 * len_score
        + 0.3 * alpha_ratio
        + 0.2 * (1 - F.least(punct_ratio * 4, F.lit(1.0)))
        + 0.2 * word_score
    )
    return F.round(score, 6)


def fingerprint(col: Column, k: int = 8) -> Column:
    """64-bit document fingerprint: xxhash64 over the min-hashed
    word-k-gram set of the whitespace-normalized lowercase text (a
    rolling-hash-style content id, robust to whitespace changes)."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    toks = tokens(norm)
    n = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, k))),
    )
    return F.xxhash64(F.array_min(grams), F.array_max(grams), F.size(toks))


def document_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience projection adding all four stats."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "lang_pred": lang_id(c),
            "quality": quality_score(c),
            "fingerprint": fingerprint(c),
        }
    )


def repetition_score(col: Column, n: int = 2) -> Column:
    """Within-document repetition: 1 - distinct/total word n-grams
    (the Gopher/C4-style duplicate-n-gram filter signal — boilerplate
    and spam score high). 0.0 for docs shorter than n tokens.
    Explode-free single projection, BUT the n-gram list is built with
    F.transform, whose lambda is INTERPRETED (not codegen'd) on this
    build — fine for moderate docs, not the hot-path shape. For the
    100-TB scale path use :func:`repetition_stats` (posexplode +
    window lead + codegen'd aggregation)."""
    toks = tokens(col)
    total = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(total, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(
            1 - F.size(F.array_distinct(grams)) / total.cast("double"), 6
        )
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    out_col: str = "repetition",
    id_col: str | None = None,
) -> DataFrame:
    """Scale-path duplicate-n-gram repetition (same score as
    :func:`repetition_score`, different physical plan): posexplode
    the token array, build each n-gram with ``lead()`` over a
    per-document window, then a codegen'd
    ``1 - count_distinct/count`` aggregation — no interpreted HOF
    lambda anywhere. Costs one shuffle on the doc id (window + agg
    share the hash partitioning; AQE coalesces), which is the right
    trade at 100 TB where per-row interpreted lambdas dominate.
    ``id_col`` names an existing unique id; when None a
    monotonically_increasing_id is used (deterministic within one
    job, so safe here — the id never leaves the query)."""
    from pyspark.sql import Window

    rid = id_col or "__rid"
    base = (
        df if id_col else df.withColumn(rid, F.monotonically_increasing_id())
    )
    # raw split + post-explode empty filter, NOT tokens() — its
    # F.filter HOF lambda is interpreted; a WHERE after explode is
    # codegen'd and lead() only needs order, not contiguous positions
    raw = F.split(F.lower(F.col(text_col)), r"[^a-zA-Z0-9']+")
    ex = base.select(
        F.col(rid), F.posexplode(raw).alias("__pos", "__tok")
    ).where(F.col("__tok") != "")
    w = Window.partitionBy(rid).orderBy("__pos")
    parts = [F.col("__tok")] + [
        F.lead("__tok", i).over(w) for i in range(1, n)
    ]
    grams = ex.select(
        F.col(rid),
        F.concat_ws(" ", *parts).alias("__gram"),
        # a gram is complete iff its last token exists (tokens are
        # never null, so a null lead marks the ragged tail)
        F.lead("__tok", n - 1).over(w).isNotNull().alias("__full"),
    )
    per = (
        grams.where(F.col("__full"))
        .groupBy(rid)
        .agg(
            F.round(
                1 - F.count_distinct("__gram") / F.count("__gram"), 6
            ).alias(out_col)
        )
    )
    out = base.join(per, rid, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0.0))
    )
    return out if id_col else out.drop(rid)


def quality_flags(col: Column, min_words: int = 50,
                  max_words: int = 100_000, min_stop_words: int = 2):
    """Gopher-style boolean quality rules (Rae et al. 2021 §A1.1, the
    standard web-corpus repetition/format gate), each a pure column
    expression; returns a dict of named flag Columns plus 'pass_all'.

    Rules: word count in [min_words, max_words]; mean word length in
    [3, 10]; symbol-to-word ratio (# and ellipsis) <= 0.1; <= 90% of
    lines bullet-started; <= 30% of lines ellipsis-ended; at least
    ``min_stop_words`` distinct English stop words present."""
    toks = tokens(col)
    n_words = F.size(toks)
    # mean word length WITHOUT a HOF aggregate (interpreted on this
    # build — CLAUDE.md): total token chars = length of the
    # separator-free token concat, a codegen'd expression
    mean_wl = F.length(F.concat_ws("", toks)) / F.greatest(
        n_words, F.lit(1)
    )
    n_symbols = (
        F.length(col) - F.length(F.regexp_replace(col, r"#", ""))
        + (F.length(col) - F.length(F.regexp_replace(col, r"\.\.\.", "")))
        / 3
    )
    n_lines = F.regexp_count(col, F.lit(r"\n")) + 1
    bullet_lines = F.regexp_count(col, F.lit(r"(^|\n)[ \t]*[-*•]"))
    ellipsis_lines = F.regexp_count(col, F.lit(r"\.\.\.(\n|$)"))
    stop_hits = F.size(
        F.array_intersect(
            toks, F.array(*[F.lit(w) for w in _LANG_STOPWORDS["en"]])
        )
    )
    flags = {
        "flag_word_count": (n_words >= min_words) & (n_words <= max_words),
        "flag_mean_word_len": (mean_wl >= 3) & (mean_wl <= 10),
        "flag_symbol_ratio": n_symbols / F.greatest(n_words, F.lit(1)) <= 0.1,
        "flag_bullet_ratio": bullet_lines / n_lines <= 0.9,
        "flag_ellipsis_ratio": ellipsis_lines / n_lines <= 0.3,
        "flag_stopwords": stop_hits >= min_stop_words,
    }
    pass_all = None
    for c in flags.values():
        pass_all = c if pass_all is None else (pass_all & c)
    flags["pass_all"] = pass_all
    return flags


def scrub_pii(col: Column) -> Column:
    """Redact common PII patterns (training-data hygiene): emails,
    then phone-like number runs, then bare IPv4s — pure codegen'd
    regexp_replace chain, order matters (emails contain digits; IPs
    would otherwise match inside longer number runs).

    The phone heuristic is deliberately aggressive on SINGLE-LINE
    digit runs with phone separators (over-redaction is the safe
    direction for PII) but never crosses a line break — a
    newline-separated column of numbers stays intact."""
    out = F.regexp_replace(
        col, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    )
    out = F.regexp_replace(
        out, r"\+?[0-9][0-9()\- \t]{6,}[0-9]", "<PHONE>"
    )
    out = F.regexp_replace(
        out, r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"
    )
    return out
