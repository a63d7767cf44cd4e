"""Mergeable cardinality sketch — HyperLogLog with a PORTABLE hash.

ES's ``cardinality`` aggregation is HyperLogLog++ behind the scenes
(reference parity: the delegated ES agg; Flajolet et al. 2007, Heule et
al. 2013 in PAPERS.md). Spark has ``approx_count_distinct`` (also HLL++),
but its xxhash64-based register values are engine-private — no SQL oracle
can reproduce them. This implementation keeps the HLL structure and makes
every step portable:

* hash       = ``hash32`` (first 8 md5 hex chars as a long — the repo-wide
               portability contract, dedup.py:31),
* register   = low ``p`` bits;  word ``w`` = the remaining ``32-p`` bits,
* rho(w)     = leftmost-1 position = ``33 - p - length(bin(w))`` (both
               engines' ``bin()`` strips leading zeros), ``33 - p`` for 0,
* estimate   = alpha_m · m² / Σ 2^(−M_j) with the standard small-range
               correction E ≤ 2.5m ∧ V>0 → m·ln(m/V).

Float portability: every 2^(−M_j) term is an exact power of two with
exponent ≥ −(33−p), so the register sum is EXACT in float64 regardless of
summation order (exponent span < 53 bits) — the only libm calls are one
``ln`` and one divide at the end, absorbed by the 4-dp round.

Scale: one map-side-combinable ``groupBy(idx).max(rho)`` over ≤ 2^p keys
followed by a scalar aggregate — the sketch is what a 1000-executor
cardinality SHOULD be: constant-size state per partition, one tiny
shuffle, no distinct-set materialization. Accuracy ~1.04/√m (±3.2% at
p=10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_es_spark.operators.dedup import hash32


def hll_registers(df: DataFrame, col: str, p: int = 10) -> DataFrame:
    """(idx, mr): occupied HLL registers of ``df[col]``'s value set.

    This relation IS the sketch — mergeable across corpora/epochs by
    ``union → groupBy(idx).max(mr)``, the property that lets a streaming
    index keep per-epoch sketches and serve global cardinality without
    rescanning (ES keeps HLL per segment and merges at query time).
    """
    if not 4 <= p <= 18:
        raise ValueError(f"p={p} out of the sane HLL range [4, 18]")
    m = 1 << p
    h = hash32(F.col(col))
    w = (h / F.lit(m)).cast("long")  # h >= 0, so this is h >> p
    rho: Column = F.when(w == 0, F.lit(33 - p)).otherwise(
        F.lit(33 - p) - F.length(F.bin(w))
    )
    return (
        df.select((h % F.lit(m)).alias("idx"), rho.alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").alias("mr"))
    )


def hll_cardinality(
    df: DataFrame, col: str, p: int = 10, round_to: int = 4
) -> DataFrame:
    """One-row (estimate): HLL cardinality of the value set of ``df[col]``.

    ES ``cardinality`` agg parity (precision_threshold ≈ 2^p). The
    estimate is deterministic for a given value set — duplicates cannot
    move it (idempotent max), so it needs no DISTINCT upstream.
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = hll_registers(df, col, p).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mr"))).alias("s_present"),
        F.count(F.lit(1)).cast("double").alias("occupied"),
    )
    zeros = F.lit(float(m)) - F.col("occupied")
    raw = F.lit(alpha * m * m) / (F.col("s_present") + zeros)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(F.round(est, round_to).alias("estimate"))
