"""One SparkSession factory for the whole engine.

The reference builds an identical SparkSession in four modules
(pipeline1.py:14-34, bronzeLayer/BuildBronzeLayer.py:31-48,
silverLayer/BuildSilverLayer.py:35-52, goldLayer/BuildGoldLayer.py:27-44) and
relies on getOrCreate() dedup. Here there is exactly one factory, with
configs modernized for Spark 4.x and 100 TB posture:

- AQE on (coalesce shuffle partitions, skew-join splitting, dynamic
  broadcast) -- subsumes the reference's hand-set
  spark.sql.shuffle.partitions=10 (pipeline1.py:16).
- Arrow on for the pandas-UDF extension points (dedup/similarity/text ops).
- CORRECTED time parser policy pinned so the multi-format date parsing
  (SURVEY §2.8 F5-F7) has stable null-on-malformed semantics.
- Case-sensitive resolution kept from the reference (pipeline1.py:17) --
  NCUA bronze has mixed-case column names like `Acct_891`.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "bankcreditunion-datapipeline-spark"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def build_session(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    On a real cluster, pass ``master=None`` with an external cluster manager
    config; locally defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.caseSensitive", "true")
        # AQE: runtime re-planning (partition coalescing, skew-join split,
        # sort-merge->broadcast conversion) is the scale story for every
        # shuffle in this engine.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow batches for the pandas-UDF extension points.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Stable null-on-malformed date parsing (SURVEY §7.4).
        .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
        # Quiet progress bars in test/bench output.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    if master is None:
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = builder.master(master)
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions or cpus)
    )
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
