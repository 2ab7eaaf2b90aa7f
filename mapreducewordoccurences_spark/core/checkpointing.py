"""Lineage truncation policy for iterative operators.

Iterative DataFrame algorithms (min-label connected components, the
BPE merge loop) double their lazy plan every round; without
truncation a diameter-14 graph OOMs the DRIVER during plan
optimization before any data moves. Two truncation modes:

- ``localCheckpoint`` (default, ``checkpoint_dir=None``): pins each
  round's result in executor block storage. Zero I/O cost, but
  executor-LOCAL — on a real cluster, losing an executor
  mid-iteration loses its blocks and forces recomputation from
  scratch (lineage is gone, so Spark can't rebuild just the lost
  partitions).
- reliable ``checkpoint`` (opt-in, pass a ``checkpoint_dir`` on
  durable shared storage — HDFS/S3): each round persists to the
  checkpoint dir, surviving executor loss. Costs one write+read of
  the (small: node/label or vocab-sized) intermediate per round —
  the right trade for long-running jobs at cluster scale. See
  SCALE.md §iterative-ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def make_truncate(df_for_session: DataFrame, checkpoint_dir: str | None):
    """Returns truncate(df) implementing the chosen policy. Sets the
    session's checkpoint dir once when a reliable dir is given."""
    if checkpoint_dir is None:
        return lambda df: df.localCheckpoint(eager=True)
    sc = df_for_session.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return lambda df: df.checkpoint(eager=True)
