"""SparkSession factory with the configuration this engine assumes.

Local mode is a stand-in for a multi-executor cluster: everything here
(AQE, shuffle partition sizing, Arrow) is what we would set via
``spark-submit --conf`` on a 1000-executor cluster; only
``spark.driver.memory`` is local-mode-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "anomaly_detection_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32 in the
    sandbox).  ``shuffle_partitions`` defaults to the core count —
    on a real cluster you would size this to ~2-3x total cores and
    let AQE coalesce.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    inner = master.split("[", 1)[-1].rstrip("]")
    if shuffle_partitions is None:
        # local[N] → N; local[*] → cpus
        shuffle_partitions = cpus if inner in ("*", "") else int(inner)

    # The JVM sizes its internal pools (parallel GC threads, JIT
    # compiler threads, common ForkJoinPool) off the HOST core count,
    # not local[N]: a local[2] JVM on a 32-core box runs ~20+ GC
    # threads and bursts across every core, so several small local-mode
    # JVMs side by side collapse into scheduler/GC thrash.  Real
    # cluster executors are handed their actual core count
    # (spark.executor.cores); model that by capping the JVM's visible
    # processors at the task parallelism (+2 slack for GC/netty).
    # Override with SPARK_JVM_PROCS.
    jvm_procs = os.environ.get("SPARK_JVM_PROCS")
    if jvm_procs is None and inner not in ("*", ""):
        jvm_procs = str(min(int(inner) + 2, os.cpu_count() or cpus))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if jvm_procs:
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-XX:ActiveProcessorCount={jvm_procs}")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
