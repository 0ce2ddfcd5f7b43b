"""Sinks (SURVEY §2.2 K1-K4): partitioned parquet/delta writers.

Delta Lake is the reference's gold format (goldLayer/BuildGoldLayer.py:219);
`format="delta"` is used when delta-spark is importable and falls back to
parquet otherwise (this container has no delta), keeping the partitioning
and schema-evolution API identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def write_append(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """K1: append accumulation (bronze raw landing,
    bronzeLayer/BuildBronzeLayer.py:87,97,123,133,143)."""
    df.write.format(fmt).mode("append").save(path)


def write_overwrite(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """K2: snapshot replace (silver, silverLayer/BuildSilverLayer.py:336-337)."""
    df.write.format(fmt).mode("overwrite").save(path)


def write_gold(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    overwrite_schema: bool = False,
    fmt: str | None = None,
) -> None:
    """K3/K4: analysis-ready publish, disk-partitioned for downstream
    partition pruning (goldLayer/BuildGoldLayer.py:217-236).

    overwrite_schema=True is the schema-evolution path for the quarter-pivot
    tables whose column set grows each quarter (K4, `overwriteSchema`
    goldLayer/BuildGoldLayer.py:230).
    """
    fmt = fmt or ("delta" if delta_available() else "parquet")
    writer = df.write.format(fmt).mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if overwrite_schema and fmt == "delta":
        writer = writer.option("overwriteSchema", "true")
    writer.save(path)
