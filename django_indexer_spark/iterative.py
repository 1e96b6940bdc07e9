"""Lineage control for iterative operators (CC / PageRank / k-core /
BPE rounds).

Every loop in this engine materializes its per-round state to cut
lineage — otherwise the unrolled DAG makes plan analysis superlinear in
rounds (graph.py module docstring). Locally that is ``localCheckpoint``
(executor-memory blocks, no durable storage needed). On a REAL cluster
``localCheckpoint`` is a fault-tolerance trade: blocks live only on the
executors that computed them, so losing one executor kills the job's
lineage. When the session has a reliable checkpoint directory
configured (``sparkContext.setCheckpointDir`` — HDFS/S3 on a cluster,
see session.get_spark_cluster), iterative state should instead go
through ``df.checkpoint``, which writes to that directory and survives
executor loss.

``cut_lineage`` is the one switch all loops share: reliable
``checkpoint(eager=True)`` when a checkpoint dir is set, else
``localCheckpoint(eager=...)``. Behavior (values, round structure) is
identical either way — only the materialization target changes — so the
correctness gates run unchanged and a cluster deploy flips the switch
by configuring the directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def has_checkpoint_dir(df: DataFrame) -> bool:
    try:
        return df.sparkSession.sparkContext.getCheckpointDir() is not None
    except Exception:
        return False


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and return a lineage-free frame (see module
    docstring for the reliable-vs-local choice)."""
    if has_checkpoint_dir(df):
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
