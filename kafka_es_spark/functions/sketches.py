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


# --- Bloom filter -------------------------------------------------------------
#
# The membership sketch behind segment-level "can this term/url be here?"
# pruning (Lucene keeps per-segment bloom filters for _id lookups; a 10^12-doc
# dedup pass uses one to skip the join for never-seen keys). Same portability
# contract as HLL: k salted hash32 positions, so a DuckDB oracle replays the
# identical bit set. One-sided error: a member is NEVER reported absent;
# non-members false-positive at ~(1 - e^(-kn/m))^k.


def bloom_bits(df: DataFrame, col: str, m_bits: int, k: int = 4) -> DataFrame:
    """(bit,): the distinct set bits of a Bloom filter over ``df[col]``.
    This relation IS the sketch — mergeable across corpora/epochs by
    ``union → distinct`` (bitwise OR), bounded at ``m_bits`` rows however
    large the input. Bit i of value v = hash32('b<i>:' || v) % m_bits."""
    if k < 1 or m_bits < 2:
        raise ValueError(f"need k >= 1 (got {k}) and m_bits >= 2 (got {m_bits})")
    c = F.col(col)
    bits = F.array(
        *[
            hash32(F.concat(F.lit(f"b{i}:"), c)) % F.lit(m_bits)
            for i in range(k)
        ]
    )
    return (
        df.filter(c.isNotNull())
        .select(F.explode(bits).alias("bit"))
        .distinct()
    )


def bloom_maybe_contains(
    probes: DataFrame, col: str, bits: DataFrame, m_bits: int, k: int = 4
) -> DataFrame:
    """Per probe row: (value, maybe) — True iff ALL k bit positions of the
    probe are set in ``bits`` (Bloom semantics: True = maybe present,
    False = DEFINITELY absent).

    Plan: probes explode to k (value, bit) rows, one equi-join against the
    ≤m_bits-row sketch (AQE broadcasts it when it fits — a 2^27-bit filter
    is ~1 GB of longs, still executor-resident), then a per-value count ==
    k. No corpus side anywhere: the corpus was folded into the sketch
    once, upstream."""
    c = F.col(col)
    pos = F.array(
        *[
            hash32(F.concat(F.lit(f"b{i}:"), c)) % F.lit(m_bits)
            for i in range(k)
        ]
    )
    exploded = probes.filter(c.isNotNull()).select(
        c.alias("value"), F.explode(F.array_distinct(pos)).alias("bit"),
        F.size(F.array_distinct(pos)).alias("need"),
    )
    hit = bits.withColumn("set", F.lit(1))
    return (
        exploded.join(hit, "bit", "left")
        .groupBy("value", "need")
        .agg(F.count("set").alias("have"))
        .select("value", (F.col("have") == F.col("need")).alias("maybe"))
    )


# --- Count-Min sketch ---------------------------------------------------------
#
# The frequency sketch (Cormode & Muthukrishnan 2005) behind heavy-hitter
# detection at 10^12 tokens: d×w counters, point estimate = min over d rows —
# always an OVERestimate (one-sided), error ≤ 2N/w with prob 1 − (1/2)^d.
# Portable salted hash32 rows, exact integer counters, so the estimate is
# deterministic and DuckDB-replayable.


def cms_counters(
    df: DataFrame, col: str, w: int = 1024, d: int = 4,
    weight: str | None = None,
) -> DataFrame:
    """(r, c, cnt): the non-zero counters of a d×w Count-Min sketch over
    ``df[col]`` occurrences (or ``weight``-weighted counts). Mergeable
    across epochs by ``union → groupBy(r, c).sum(cnt)``; bounded at d·w
    rows. Counter (r, c) += 1 for every value v with
    hash32('c<r>:' || v) % w == c."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 (got {d}) and w >= 2 (got {w})")
    c0 = F.col(col)
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (hash32(F.concat(F.lit(f"c{r}:"), c0)) % F.lit(w)).alias("c"),
            )
            for r in range(d)
        ]
    )
    wcol = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    return (
        df.filter(c0.isNotNull())
        .select(F.explode(rows).alias("rc"), wcol.alias("n"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.sum("n").alias("cnt"))
    )


def cms_point_estimates(
    probes: DataFrame, col: str, counters: DataFrame, w: int = 1024, d: int = 4
) -> DataFrame:
    """Per probe value: (value, estimate) — min over the d counter rows,
    absent counters read as 0 (a value the sketch never saw estimates 0,
    not null). Join cost: k·|probes| rows against the ≤d·w-row sketch."""
    c = F.col(col)
    pos = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (hash32(F.concat(F.lit(f"c{r}:"), c)) % F.lit(w)).alias("c"),
            )
            for r in range(d)
        ]
    )
    exploded = probes.filter(c.isNotNull()).select(
        c.alias("value"), F.explode(pos).alias("rc")
    ).select("value", F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    return (
        exploded.join(counters, ["r", "c"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
        .groupBy("value")
        .agg(F.min("cnt").alias("estimate"))
    )


def cms_heavy_hitters(
    df: DataFrame, col: str, w: int = 1024, d: int = 4,
    threshold: int = 100,
) -> DataFrame:
    """Candidate heavy hitters: distinct values whose CMS estimate >=
    threshold — a superset of the true >= threshold set (CMS never
    underestimates), to be exact-counted in a second cheap pass over only
    the candidates. In one batch job this costs what groupBy(value).count()
    costs (the distinct IS that shuffle); the sketch earns its keep in the
    streaming/multi-epoch setting — per-epoch d·w-row counter relations
    merge by sum, so a long-running stream answers "what got hot across
    all epochs" without rescanning any epoch (the compact_stats shape)."""
    counters = cms_counters(df, col, w=w, d=d)
    return cms_point_estimates(
        df.select(col).distinct(), col, counters, w=w, d=d
    ).filter(F.col("estimate") >= threshold)
