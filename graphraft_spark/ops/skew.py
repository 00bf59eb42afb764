"""Skew-handling utilities for hub-heavy graphs and hot keys.

AQE's skew-join splitting (on by default in graphraft_spark.session)
handles most cases at runtime; these helpers cover the two patterns AQE
can't fix:

* ``salted_join`` — a large-×-medium join where one join key is a hub
  (a highly-cited paper, a giant topic): salt the skewed side, replicate
  the other side per salt, join on (key, salt).  Replication cost is
  salt_factor × |other|, so use it only for genuinely medium others.
* ``salted_distinct_count`` — two-phase distinct count for a key whose
  group would otherwise land on one reducer: pre-aggregate per (key,
  salt-of-value), then merge.  (Catalyst's partial aggregation already
  does this for countDistinct; the helper exists for custom aggregates
  composed on top — and documents the pattern.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(skewed: DataFrame, other: DataFrame, key: str,
                salt_factor: int = 8, how: str = "inner") -> DataFrame:
    """Join ``skewed`` (hot keys) with ``other`` on ``key`` by salting:
    skewed rows get a random-but-deterministic salt (hash of all
    columns), other rows are replicated across all salts."""
    salted = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]),
               F.lit(salt_factor)).cast("int"))
    salts = other.sparkSession.range(salt_factor).select(
        F.col("id").cast("int").alias("__salt"))
    replicated = other.crossJoin(F.broadcast(salts))
    out = salted.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")


def salted_distinct_count(df: DataFrame, group_key: str, value: str,
                          salt_factor: int = 32) -> DataFrame:
    """Distinct-count of ``value`` per ``group_key`` with an explicit
    two-phase plan: partial distinct per (key, salt(value)) partition,
    then sum — no single reducer ever sees a whole hot group."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(value)), F.lit(salt_factor)))
    partial = (salted.groupBy(group_key, "__salt")
               .agg(F.countDistinct(value).alias("__part")))
    return (partial.groupBy(group_key)
            .agg(F.sum("__part").cast("bigint").alias("n_distinct")))


def skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Key-frequency profile — the diagnostic that decides whether AQE
    suffices or a salt is warranted."""
    return (df.groupBy(key).agg(F.count("*").alias("n"))
            .orderBy(F.desc("n")).limit(top))
