"""Aggregation utilities: explicit two-phase salted aggregation for
hot keys (SURVEY.md §4 O9 — the north rule's "salted repartitioning"
for Zipf-hot rule signatures / domains).

Spark's hash aggregate already does map-side partial aggregation, which
covers *count-like* skew; the salted form matters when the per-key
state is large (collect_list/distinct sketches) or when AQE can't split
a straggler (single monster key inside one shuffle block).  The salt
fans one hot key out to ``salt_n`` reducers, then a second (tiny)
aggregation merges the partials — the classic partial/final split."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, keys: list[str], salt_n: int = 16) -> DataFrame:
    """groupBy(keys).count() with a salt stage: phase 1 aggregates
    (keys, salt) partials, phase 2 merges per key.  Result column: n.

    The salt mixes ``xxhash64`` of the whole row with
    ``spark_partition_id()``: the content hash alone degenerates when a
    hot key's rows are byte-identical (every duplicate lands in one
    salt bucket, re-concentrating the skew), while the partition id
    alone varies with task assignment.  The mix fans identical rows
    across buckets by their physical placement; the FINAL counts are
    salt-independent either way (phase 2 re-merges per key), so results
    stay deterministic."""
    salted = df.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*df.columns, F.lit(42)) + F.spark_partition_id(),
            F.lit(salt_n),
        ),
    )
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_pn"))
    return partial.groupBy(*keys).agg(F.sum("_pn").cast("long").alias("n"))
