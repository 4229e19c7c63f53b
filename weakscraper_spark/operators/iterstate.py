"""Shared lineage-truncation helper for the iterative operators
(connected components, BPE training): one definition of the
localCheckpoint-vs-reliable-checkpoint choice so the trade-off text
and behavior can't drift between copies (r04 review)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ckpt(df: DataFrame, checkpoint_dir: str | None,
         eager: bool = True) -> DataFrame:
    """Truncate lineage: ``localCheckpoint`` (fast, executor-storage —
    lost on executor death) or reliable ``checkpoint`` into
    ``checkpoint_dir`` when given (the preemptible-cluster setting).
    ``setCheckpointDir`` is idempotent for a fixed dir, so calling it
    per truncation is safe.

    ``eager=False`` skips the dedicated materialization job — for
    call sites whose NEXT statement is an action over the full
    checkpointed relation (the iterative loops' per-round scalar
    reads), that action materializes the checkpoint as a side effect
    and one scheduled job per round is saved (r08)."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)
