"""Deterministic sampling & split assignment (training-data pipeline ops).

Spark's native ``sample``/``sampleBy`` are Bernoulli draws over the row
STREAM — the kept set depends on partition layout and row order, so a
re-run, a repartition, or a cluster resize silently changes the sample.
A 100 TB training pipeline needs the opposite: membership must be a pure
function of the KEY, so samples are reproducible across runs/engines,
stable under incremental appends (old rows never flip), and auditable.

Everything here derives from the first 8 hex digits of ``md5(key‖seed)``
— a uniform 32-bit integer both Spark and the DuckDB oracle compute
identically, making sample membership itself hash-checkable. All ops are
narrow maps (filter/CASE on a scan — no shuffle, fuses into pushdown).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column, seed: str = "", buckets: int = BUCKETS) -> Column:
    """Deterministic uniform bucket in [0, buckets) from md5(key‖seed).

    DuckDB twin: ``('0x' || substr(md5(CAST(k AS VARCHAR) || seed), 1, 8))
    ::UBIGINT % buckets``.
    """
    h = F.md5(F.concat(key.cast("string"), F.lit(seed)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def deterministic_sample(
    df: DataFrame, key: str, rate: float, seed: str = ""
) -> DataFrame:
    """Keep ~rate of rows, membership a pure function of the key."""
    return df.filter(hash_bucket(F.col(key), seed) < int(rate * BUCKETS))


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rates: dict[str, float], seed: str = ""
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample boilerplate-heavy
    sources, keep all of rare ones) — the mixture-weighting step of a
    training-data pipeline. Unlisted strata are dropped."""
    b = hash_bucket(F.col(key), seed)
    thresh = F.lit(None).cast("long")
    for value, rate in rates.items():
        thresh = F.when(F.col(stratum) == value, F.lit(int(rate * BUCKETS))).otherwise(
            thresh
        )
    return df.filter(b < thresh)


def split_assign(
    df: DataFrame,
    key: str,
    val_pct: float = 0.01,
    test_pct: float = 0.01,
    seed: str = "split",
) -> DataFrame:
    """Append a train/val/test ``split`` column — disjoint, exhaustive,
    and stable under appends (a document's split never changes when the
    corpus grows; the leakage guarantee evals depend on)."""
    b = hash_bucket(F.col(key), seed)
    val_hi = int(val_pct * BUCKETS)
    test_hi = val_hi + int(test_pct * BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < val_hi, F.lit("val"))
        .when(b < test_hi, F.lit("test"))
        .otherwise(F.lit("train")),
    )
