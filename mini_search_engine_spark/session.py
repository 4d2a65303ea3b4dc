"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_memory() -> str:
    """Moderate local-mode heap: the driver IS the executor in local mode.
    Measured on this box (32-core, 125G): a 73g heap gives wildly jittery
    task times (2s–41s for the identical job — GC over a huge region count
    plus first-touch page zeroing), while 16g is steady; 8g evicts the
    corpus+tf caches. Cache overflow spills to disk/tmpfs, so bigger heap
    is NOT better. On a real cluster spark-submit sizes executors."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) // (1024 * 1024)
                    return f"{max(4, min(int(avail_gb * 0.25), 16))}g"
    except OSError:
        pass
    return "8g"


def get_spark(
    app_name: str = "mini-search-engine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults chosen for the target workload (wide aggregations over
    exploded token streams, Arrow-batched UDFs):
    * AQE on — runtime coalescing + skew-join splitting,
    * Arrow on — every Python surface is a pandas UDF,
    * shuffle partitions sized to the local core count (a real cluster
      run overrides via spark-submit conf).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or int(cpus)))
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory()),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
