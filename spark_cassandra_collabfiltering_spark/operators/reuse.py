"""Materialize-once discipline for multiply-consumed subtrees.

A DataFrame referenced N times is planned N times; ``.cache()`` does
not help under AQE because concurrent leaf query stages race the
cache and all recompute the shared subtree (measured r10 on
dedup_minhash_lsh: 4 duplicate scan+hash stages). A LAZY local
checkpoint computes the subtree once at first action and hands every
consumer the same materialized partitions.

The fault-tolerance tradeoff (VERDICT r10 #4): ``localCheckpoint``
truncates lineage and stores partitions UNREPLICATED in executor
block managers — on a real cluster an executor loss makes the job
unrecomputable rather than slow. That is the right default for
ephemeral single-tenant analytics (and for local[n], where executor
loss means the app is gone anyway), but long multi-hour cluster jobs
should pass ``reliable_checkpoint=True`` to switch every reuse point
to a fault-tolerant ``checkpoint()`` into
``SparkContext.setCheckpointDir`` (HDFS/S3), surviving executor loss
at the cost of one distributed write per reuse point — the same
switch :func:`~spark_cassandra_collabfiltering_spark.operators.dedup.
connected_components` has exposed since r9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def shared_subtree(df: DataFrame, reliable_checkpoint: bool = False) -> DataFrame:
    """Pin a multiply-consumed subtree so it computes ONCE at first
    action: lazy local checkpoint by default, fault-tolerant
    ``checkpoint()`` when ``reliable_checkpoint`` is set (requires
    ``SparkContext.setCheckpointDir``)."""
    if reliable_checkpoint:
        sc = df.sparkSession.sparkContext
        # ValueError, not assert: stripped under `python -O`, and a
        # missing checkpoint dir must never silently degrade.
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "reliable_checkpoint=True requires "
                "SparkContext.setCheckpointDir(<fault-tolerant path>)"
            )
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)
