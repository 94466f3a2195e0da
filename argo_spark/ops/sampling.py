"""Deterministic corpus sampling and per-group quotas (driver brief:
the subsetting ops a 100-TB training-data pipeline runs before
training — reproducible samples, domain caps, stratified mixes).

Everything here is HASH-determined, never RNG-determined: a sample
must be reproducible across runs, partitionings, and retries (Spark's
``df.sample`` is none of those — it seeds per-partition), and at
100 TB the sample decision must be a map-side column expression, not
a shuffle. The hash is md5 over the stable key column, compared
against a hex threshold string — the same trick DuckDB can replay
verbatim, so every operator here is oracle-checkable.

No reference analogue (argo has no corpus ops); cites the driver
brief's training-data-pipeline requirement instead.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 8  # 32 bits of the md5 — plenty below 10^-8 fractions


def _threshold_hex(fraction: float) -> str:
    """fraction in [0, 1] -> 8-hex-digit threshold string such that
    P(md5_prefix < threshold) == fraction (md5 prefixes are uniform
    over the 16^8 space). fraction 1.0 returns "g", which every hex
    prefix sorts below ('f' < 'g'), so string comparison stays exact
    at both ends."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    v = round(fraction * 16 ** _HEX_DIGITS)
    if v >= 16 ** _HEX_DIGITS:
        # a fraction rounding up to the full space would format as 9
        # hex digits and sort BELOW most 8-digit prefixes — keep-all
        # is the correct meaning
        return "g"
    return format(v, f"0{_HEX_DIGITS}x")


def _hash_prefix(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))),
                       1, _HEX_DIGITS)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "s0"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose md5(key‖salt)
    prefix falls below the fraction threshold. Map-only (one column
    expression, no shuffle, no state); the SAME keys are kept at any
    scale, partitioning, or retry — the property training-data
    reproducibility actually needs. Different ``salt`` values give
    independent samples for held-out splits."""
    if fraction >= 1.0:
        return df
    thresh = _threshold_hex(fraction)
    return df.where(_hash_prefix(F.col(key_col), salt) < F.lit(thresh))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling (corpus mixing: 'keep 10%
    of crawl, 100% of wiki'): the threshold is selected per row from
    a CASE over the stratum column — still map-only, still one scan.
    Strata absent from ``fractions`` fall back to
    ``default_fraction`` (0.0 = drop, the explicit-mix contract)."""
    expr: Column = F.lit(_threshold_hex(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(_threshold_hex(frac))
        ).otherwise(expr)
    return df.where(_hash_prefix(F.col(key_col), salt) < expr)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    key_col: str,
    keep_order: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Per-group quota (domain caps: 'at most N docs per source').
    Ranks rows inside each group by md5(key) — a deterministic,
    content-independent shuffle order, so the kept subset is an
    unbiased within-group sample, not 'first N by ingest order' —
    and keeps rank <= max_rows. One shuffle on the group column;
    skewed groups are exactly the ones being capped, and AQE's skew
    handling splits their partitions. ``keep_order`` overrides the
    ranking columns (e.g. quality-score descending) for
    keep-the-best-N quotas; ``key_col`` is always appended as the
    final tiebreak so ties stay deterministic."""
    from pyspark.sql.window import Window

    # key_col always participates as the final tiebreak: ties in the
    # caller's keep_order columns would otherwise make row_number —
    # and therefore the kept subset — partition-order-dependent,
    # breaking the module's reproducibility contract
    order = (
        [F.col(c) for c in keep_order] + [F.col(key_col)]
        if keep_order
        else [_hash_prefix(F.col(key_col), "quota"), F.col(key_col)]
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= max_rows)
        .drop("__rank")
    )


def assign_split(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float],
    salt: str = "split0",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test (or any named) split: a new
    column assigning each row to a split by where its md5(key‖salt)
    prefix falls among the cumulative weight thresholds. Map-only and
    hash-determined like everything in this module — the same key
    lands in the same split at any scale, partitioning, or retry,
    and with the same salt ACROSS TABLES (a doc and its embedding row
    split identically when keyed alike). Weights must sum to 1
    (±1e-9); split names are assigned in sorted-name order so the
    assignment is independent of dict iteration order."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if not weights:
        raise ValueError("weights must be non-empty")
    h = _hash_prefix(F.col(key_col), salt)
    cum = 0.0
    expr: Column | None = None
    names = sorted(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = h < F.lit(_threshold_hex(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)
