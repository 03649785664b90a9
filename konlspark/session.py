"""SparkSession factory with the engine's tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "konlspark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              driver_memory: str | None = None) -> SparkSession:
    """Local-mode session tuned for this engine.

    In production this is ``spark-submit`` against a real cluster and
    every setting below except Arrow/AQE comes from the cluster conf;
    ``cores`` maps to executor count for the scaling-efficiency runs.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cores)
    if driver_memory is None:
        driver_memory = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # scan-parallelism floor (r9, guide §6): the driver tables are
        # single small parquet files whose default split math
        # (128 MB maxPartitionBytes, 4 MB openCost) yields 1-2 input
        # tasks, serializing every per-row expression computed below
        # the first exchange onto 1-2 cores. A floor of one split per
        # core is scale-ADAPTIVE: at real scale files already split
        # into >= parallelism tasks and both settings are no-ops;
        # locally they let small-file scans use the whole machine.
        .config("spark.sql.files.minPartitionNum",
                os.environ.get("SPARK_GRAFT_MIN_PARTITION_NUM", str(cores)))
        .config("spark.sql.files.openCostInBytes",
                os.environ.get("SPARK_GRAFT_OPEN_COST", str(64 * 1024)))
        # AQE coalescing floor (r9, measured): the default 1 MB
        # minPartitionSize coalesces compute-dense-but-byte-light
        # shuffle stages (string distinct + k seeded digests in the
        # MinHash path) down to ~12 tasks on 32 cores, serializing
        # them. 256k trades ~ms of task overhead for parallelism on
        # exactly those stages (d4 10.2 -> 6.9 s at sf1.0/32c; engine
        # queries neutral). Scale-safe: the advisory size still
        # governs large shuffles — this floor only affects stages
        # whose total bytes are small enough for AQE to over-coalesce.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                "256k")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
        # shuffle/spill on tmpfs: the VM's virtio disk has high variable
        # latency that makes local-mode shuffle timings bimodal; a real
        # cluster would use local SSDs
        .config("spark.local.dir", _local_dir())
        # executors must be able to import konlspark
        .config("spark.executorEnv.PYTHONPATH", _repo_root())
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _local_dir() -> str:
    if os.path.isdir("/dev/shm"):
        path = "/dev/shm/konlspark-spark-tmp"
        os.makedirs(path, exist_ok=True)
        return path
    return "/tmp"
