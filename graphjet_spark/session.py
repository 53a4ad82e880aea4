"""SparkSession factory tuned for the link-graph engine.

Design notes (scale-first):
- AQE on: runtime join re-planning + skew-join splitting each superstep
  (the iterative joins change cardinality every iteration, so static
  planning is wrong by construction).
- Arrow on: every Python-side kernel in this engine is a vectorized
  pandas/Arrow UDF (no per-row Python anywhere — see BASELINE.json
  input_hint).
- shuffle.partitions sized to cores for local mode; a real cluster run
  would set this ~2-3x total cores and rely on AQE coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "graphjet_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    in this sandbox; on a real cluster the submitter sets the master and
    this factory only contributes SQL/Arrow conf.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Measured on this box: oversized heaps (48g) stall high-thread
        # local runs with GC (64s -> 26s on a 15M-edge superstep batch
        # just by dropping 48g -> 8g). 12g covers every sf tier here.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        # Iterative supersteps churn localCheckpoint blocks: a dropped
        # round's blocks are only released after a full GC lets the
        # ContextCleaner enqueue the dead RDD, and Spark's default
        # periodic-GC interval is 30min — long superstep loops allocate
        # round-state faster than that at web scale (measured: star-CC
        # at 195M edges OOM'd a 48g heap on accumulated round
        # snapshots; the same fix GraphFrames documents for its CC).
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        # tmpfs shuffle dirs: local-mode shuffles are disk-bound well
        # before CPU at high thread counts (a real cluster spreads this
        # across executors' local disks)
        builder = builder.config("spark.local.dir", local_dir)
    if not SparkSession.getActiveSession():
        builder = builder.master(master)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
