"""Cluster bootstrap helpers — the Spark analogue of the reference's
``marEx.helper`` HPC utilities (helper.py:90-639: configure_dask +
SLURM/DKRZ cluster constructors).  Dask LocalCluster/SLURMCluster maps
onto Spark deploy modes; instead of constructing a cluster in-process,
these helpers produce a TUNED configuration (for ``get_spark`` locally
or ``spark-submit`` on a real cluster) sized from the same inputs the
reference takes (workers, memory, scratch dir).

Nothing here talks to a cluster manager — configuration is data, so it
is unit-testable and carries the 100 TB sizing rules from SCALE.md as
executable defaults rather than prose.
"""

from __future__ import annotations

import os
import tempfile

from marex_spark.exceptions import ConfigurationError

# one in-flight shuffle partition should comfortably fit in executor
# memory: target ~128 MB post-compression blocks (SCALE.md §1)
TARGET_PARTITION_BYTES = 128 * 1024 * 1024


def recommended_shuffle_partitions(
    dataset_bytes: int, min_partitions: int = 32
) -> int:
    """Size ``spark.sql.shuffle.partitions`` so a partition ≈ 128 MB
    (SCALE.md's 0.25°-decade example: 15 TB → ~120k partitions)."""
    if dataset_bytes <= 0:
        return min_partitions
    return max(min_partitions, int(dataset_bytes / TARGET_PARTITION_BYTES))


def configure_spark(
    scratch_dir: str | None = None,
    workers: int | None = None,
    memory_per_worker_gb: int | None = None,
    dataset_bytes: int | None = None,
    config: dict | None = None,
) -> dict:
    """Build the engine's tuned Spark conf dict (the reference's
    ``configure_dask`` contract, helper.py:90-135: scratch dir + sane
    defaults + user overrides — returned, not applied).

    Use locally as ``get_spark(extra_conf=configure_spark(...))`` or
    feed to ``spark-submit --conf k=v`` on a real cluster."""
    scratch = scratch_dir or tempfile.gettempdir()
    if not os.path.isdir(scratch):
        os.makedirs(scratch, exist_ok=True)

    conf: dict[str, str] = {
        "spark.local.dir": scratch,
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.files.maxPartitionBytes": str(TARGET_PARTITION_BYTES),
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    }
    if workers is not None:
        if workers <= 0:
            raise ConfigurationError(
                "workers must be positive", details={"workers": workers}
            )
        conf["spark.executor.instances"] = str(workers)
        conf["spark.default.parallelism"] = str(workers * 4)
    if memory_per_worker_gb is not None:
        if memory_per_worker_gb <= 0:
            raise ConfigurationError(
                "memory_per_worker_gb must be positive",
                details={"memory_per_worker_gb": memory_per_worker_gb},
            )
        # leave ~10% headroom for the off-heap/OS share, as the
        # reference's worker memory-limit convention does
        conf["spark.executor.memory"] = f"{max(1, int(memory_per_worker_gb * 0.9))}g"
    if dataset_bytes is not None:
        conf["spark.sql.shuffle.partitions"] = str(
            recommended_shuffle_partitions(dataset_bytes)
        )
    if config:
        conf.update({str(k): str(v) for k, v in config.items()})
    return conf


def start_local_cluster(
    n_workers: int | None = None,
    scratch_dir: str | None = None,
    config: dict | None = None,
):
    """Local-mode convenience (the reference's LocalCluster path,
    helper.py:538-639): build a session with the tuned conf applied."""
    from marex_spark.session import get_spark

    return get_spark(
        cores=n_workers,
        extra_conf=configure_spark(scratch_dir=scratch_dir, config=config),
    )
