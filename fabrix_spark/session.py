"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the
configs below are chosen so the same code scales to a multi-executor
cluster: AQE for runtime re-planning (skew joins, partition
coalescing), Arrow for any Python exchange, UTC session timezone so
timestamp semantics match an external oracle (DuckDB is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "fabrix_spark",
    master: str | None = None,
    ui: bool = False,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Settings that matter at 100 TB and are harmless locally:
    AQE + skew-join handling, partition coalescing, broadcast join
    threshold left to Spark's default (AQE converts eligible joins at
    runtime based on observed sizes). ``ui=True`` keeps the Spark UI
    (and its REST API) up for diagnostics that need per-task metrics —
    tools/scaling_curve.py's straggler measurement; off by default
    (tests/bench don't want the port + history overhead).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", os.environ.get("FABRIX_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true" if ui else "false")
        .config("spark.driver.memory", os.environ.get("FABRIX_DRIVER_MEM", "8g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif os.environ.get("FABRIX_MASTER"):
        builder = builder.master(os.environ["FABRIX_MASTER"])
    else:
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-mutable engine settings to an externally created
    session (the driver owns the session in ``__spark_entry__`` calls).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    except Exception:
        pass  # some confs may be static on certain deployments
    return spark
