"""SparkSession factory.

The reference runs everything in one single-threaded python process
(`/root/reference/src/preprocess.py`, `train.py`); here the execution
substrate is a Spark cluster. Local testing uses ``local[N]`` but all
defaults are chosen to survive a 1000-executor / 100 TB deployment:
AQE on (runtime join re-planning + skew handling + partition
coalescing), UTC session timezone (oracle comparability), Arrow for
any pandas interchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bigdata-lab4-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local parallelism follows ``SPARK_GRAFT_CPUS`` when set (the
    driver's bench contract). On a real cluster ``master`` comes from
    spark-submit and this factory only contributes conf defaults.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        # At 100 TB this is overridden per-deployment; for local[N]
        # match the core count so post-shuffle tasks don't fragment.
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # r22: preferSortMergeJoin=false is NOT set engine-wide any more
        # — SHJ requires every per-partition build side to fit in memory
        # and AQE will not convert a chosen SHJ back to SMJ, so a global
        # default trades sorts for potential OOMs on 100 TB skewed
        # builds. The queries where the hash join is the deliberate
        # choice carry their own SHUFFLE_HASH hints (j04, j04b, s08,
        # l02b, l07b), each with a bounded-build-side argument at the
        # hint site (guide §3.1).
        # zstd beats snappy on ratio at similar read speed (guide §6) for
        # everything the engine writes (predictions sink, streaming).
        .config("spark.sql.parquet.compression.codec", "zstd")
        # the driver testdata's events.ts is TIMESTAMP(NANOS) — read the
        # physical int64; catalog.load_table converts to µs timestamps
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
