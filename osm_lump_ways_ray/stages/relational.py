"""Relational helpers shared by the pipelines.

``hash_join`` wraps ``Dataset.join`` with aggregator resource caps: Ray's hash
shuffle reserves ``num_cpus ∝ num_partitions / num_aggregators`` per aggregator
actor, so a pipeline whose single streaming DAG contains several joins can
reserve more CPUs than the cluster has and deadlock (observed on a 4-CPU local
session). Capping each aggregator at a fractional CPU keeps multi-join DAGs
schedulable while the streaming executor still bounds actual parallelism.
"""

from __future__ import annotations

from typing import Optional, Tuple


def hash_join(left, right, on: Tuple[str, ...], how: str = "inner",
              num_partitions: int = 16, right_on: Optional[Tuple[str, ...]] = None,
              aggregator_num_cpus: float = 0):
    return left.join(
        right,
        how,
        num_partitions,
        on=on,
        right_on=right_on,
        aggregator_ray_remote_args={"num_cpus": aggregator_num_cpus},
    )


def broadcast_join(left, right_table, on: str, *, select=None):
    """Small-side join: ship an Arrow table/dict once via ray.put, merge per batch
    with pandas — no shuffle. ``right_table`` is a pyarrow Table."""
    import pandas as pd
    import ray

    rdf = right_table.to_pandas() if not isinstance(right_table, pd.DataFrame) else right_table
    if select is not None:
        rdf = rdf[select]
    ref = ray.put(rdf)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(ref)
        return batch.merge(small, on=on, how="inner")

    return left.map_batches(merge, batch_format="pandas")
