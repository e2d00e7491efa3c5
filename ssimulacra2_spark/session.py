"""SparkSession factory with scale-oriented defaults.

Every knob here is chosen for the 100 TB design point and merely *sized
down* for the local[N] sandbox: AQE on (runtime coalescing + skew-join
splitting), explicit shuffle partition count, Arrow for all pandas-UDF
traffic, UTC session time so timestamp arithmetic is stable across
drivers/executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def tune_process_env() -> None:
    """glibc malloc tuning for numpy-heavy Arrow workers.

    Without this, every large numpy temporary is mmap'd and munmap'd,
    and 32 concurrent Python workers turn into a kernel page-fault storm
    (measured: 38 CPU-min of sys time on an 8M-row drift pass; 2.8 min
    with the thresholds raised). Python workers inherit the JVM env, which
    inherits ours — so set this before the JVM starts."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_ARENA_MAX", "4")


def local_dirs() -> str:
    """Prefer tmpfs for shuffle/spill in this sandbox (the root disk is a
    slow virtio device; a real cluster would use NVMe local disks)."""
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-local"
        os.makedirs(d, exist_ok=True)
        return d
    return "/tmp"


def get_spark(
    app_name: str = "ssimulacra2_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or default_parallelism()
    tune_process_env()
    # At 100 TB shuffle_partitions is sized to keep post-shuffle partitions
    # ~128-256 MB (AQE coalesces down); locally 2x cores keeps all lanes busy.
    shuffle_partitions = shuffle_partitions or max(2 * cores, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # A compact post-shuffle stage must never serialize onto a handful
        # of fat tasks while the rest of the cluster idles: with the 64MB
        # default advisory, the fused ordering check's ~140MB window stage
        # coalesced to ~6 tasks x 26MB and ran 6x9s on 6 of 32 cores
        # (parallelismFirst alone did not prevent it on Spark 4.1).
        # 8MB x 32 cores right-sizes small CPU-heavy shuffles; big shuffles
        # are unaffected (they exceed the advisory per-partition anyway and
        # stay at spark.sql.shuffle.partitions). Measured: suite idle
        # core-time 26-33% -> 15% at 8M turns. On a real cluster this knob
        # scales with per-executor memory, not cores — keep >= a few MB.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Accept subset co-partitioning for joins: two snapshots bucketed
        # by conv_id can sort-merge-join on (conv_id, turn_idx) with ZERO
        # exchange (HashPartitioning(conv_id) satisfies the clustered
        # distribution of the superset key). Only kicks in when both sides
        # already share a compatible partitioning — the bucketed-snapshot
        # layout (sources/tableio.write_snapshot / benchgen.stage_pair);
        # plans without pre-partitioned children are unchanged. Skew risk
        # is the engine's own partition unit (conversations), already
        # handled by chunking/salting above the scan.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # -Xms=-Xmx + pre-touch: the heap faults in once at JVM boot. This
        # sandbox VM services first-touch page faults through an
        # intermittently serialized hypervisor path (~1-2 GB/s, no parallel
        # speedup — tools/vm_pagefault_ceiling.py); lazy heap growth under
        # 32 running threads becomes a kernel fault convoy that burned
        # 70-88% of ALL cpus in sys time before this flag.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{os.environ.get('SPARK_GRAFT_DRIVER_MEM', '16g')} -XX:+AlwaysPreTouch",
        )
        .config("spark.local.dir", local_dirs())
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
