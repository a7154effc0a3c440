"""Deterministic stratified sampling (training-data extension).

Training-mixture construction at 100 TB needs per-stratum (language,
source, quality-band) down-sampling that is (a) deterministic — the same
row set on every run and every retry, so lineage and incremental reruns
stay stable; (b) shuffle-free — a pure narrow filter, no groupBy, no
sort, no sampleBy() RNG whose output depends on partitioning; and
(c) monotone in the rate — raising a stratum's rate only ADDS rows, so a
mixture can be re-weighted without invalidating previously emitted data.

The standard trick (used by CCNet / RedPajama-style pipelines): hash a
stable row key to a uniform value and keep the row iff the hash falls
below the stratum's threshold. We use md5 (hex) and compare the first 12
hex chars against the threshold `floor(rate * 16^12)` formatted as a
12-char hex literal — a plain string comparison, exactly reproducible in
any engine with md5 (the DuckDB oracle runs the identical expression).

Scale notes: the per-stratum thresholds are compiled into a literal
when-chain (a handful of strata in practice), so the whole operator is a
single whole-stage-codegen filter over the scan — zero shuffles, zero
joins, survives any cluster size unchanged. Cost is one md5 per row.

Reference analogue: the reference pipeline has no sampler (it crawls
whole sites); this is a from-scratch extension for the LLM-data use case
the brief names.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 12
_HEX_SPACE = 16**_HEX_DIGITS


def rate_threshold_hex(rate: float) -> str:
    """12-hex-char keep threshold for a rate in [0, 1]: a row is kept iff
    the first 12 hex chars of its key hash compare strictly below this
    string. rate=1.0 maps to 'g' (> every hex string) so it keeps all."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    value = int(rate * _HEX_SPACE)
    if value >= _HEX_SPACE:
        # rates just below 1.0 (e.g. 1 - 2^-53) round up to 16^12, whose
        # 13-char format would compare lexicographically BELOW most 12-char
        # hashes and keep ~6% instead of ~100% — treat as keep-all.
        return "g"  # lexicographically above any [0-9a-f]{12}
    return format(value, f"0{_HEX_DIGITS}x")


def sample_hash(key: Column, salt: str = "") -> Column:
    """The uniform sampling coordinate: first 12 hex chars of
    md5(salt || key). Lowercase-hex string; compare with `<` against
    rate_threshold_hex(rate). Changing the salt draws an independent
    sample (e.g. per-epoch resampling)."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, _HEX_DIGITS)


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    stratum_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "",
    hash_col: Optional[str] = None,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    rates maps stratum value -> keep rate in [0, 1]; strata not listed
    fall back to default_rate. The plan is a single narrow filter:
    when-chain threshold lookup (literal, no join) + one md5 per row.
    Monotonicity: for the same salt, sample(r1) ⊆ sample(r2) whenever
    r1 <= r2 per stratum — tested in tests/test_sampling.py.

    hash_col: optionally keep the sampling coordinate as a column (handy
    for downstream sub-sampling without recomputing the hash).
    """
    h = sample_hash(F.col(key_col), salt)
    thr: Column = F.lit(rate_threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == value, F.lit(rate_threshold_hex(rate))).otherwise(thr)
    if hash_col is not None:
        df = df.withColumn(hash_col, h)
        return df.where(F.col(hash_col) < thr)
    return df.where(h < thr)
