"""StructType layer contracts.

The reference declares explicit schemas at every layer boundary
(silverLayer/BuildSilverLayer.py:62-78 for bronze FDIC reads,
goldLayer/BuildGoldLayer.py:52-62 for the silver contract). We keep that
discipline: contracts are enforced on read AND validated on write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Bronze FDIC institution directory: 8 string columns
# (reference: silverLayer/BuildSilverLayer.py:62-71).
BRONZE_INSTITUTIONS = StructType(
    [
        StructField("ACTIVE", StringType()),
        StructField("CERT", StringType()),
        StructField("CITY", StringType()),
        StructField("ID", StringType()),
        StructField("NAME", StringType()),
        StructField("REPDTE", StringType()),
        StructField("STNAME", StringType()),
        StructField("WEBADDR", StringType()),
    ]
)

# Bronze FDIC quarterly financials: 5 string columns
# (reference: silverLayer/BuildSilverLayer.py:72-78).
BRONZE_FINANCIALS = StructType(
    [
        StructField("ASSET", StringType()),
        StructField("CERT", StringType()),
        StructField("DEP", StringType()),
        StructField("ID", StringType()),
        StructField("REPDTE", StringType()),
    ]
)

# Silver unified relation -- the core entity of the system
# (reference: goldLayer/BuildGoldLayer.py:52-62). Grain:
# (charter_number, institution_type, quarter_date).
FINANCIAL_INSTITUTION = StructType(
    [
        StructField("charter_number", IntegerType(), nullable=False),
        StructField("city", StringType(), nullable=False),
        StructField("name", StringType(), nullable=False),
        StructField("quarter_date", DateType(), nullable=False),
        StructField("state", StringType(), nullable=False),
        StructField("website", StringType(), nullable=False),
        StructField("assets_total", LongType(), nullable=False),
        StructField("deposits_total", LongType(), nullable=False),
        StructField("institution_type", StringType(), nullable=False),
    ]
)

FINANCIAL_INSTITUTION_KEY = ["charter_number", "institution_type", "quarter_date"]


class SchemaContractError(ValueError):
    pass


def enforce_contract(df: DataFrame, contract: StructType, strict_nullability: bool = False) -> DataFrame:
    """Validate a DataFrame against a StructType contract.

    Checks column names and types (order-insensitive); returns the DataFrame
    reordered to contract order. Raises SchemaContractError on mismatch.
    Metadata-only -- no job is triggered.
    """
    actual = {f.name: f for f in df.schema.fields}
    missing = [f.name for f in contract.fields if f.name not in actual]
    extra = [n for n in actual if n not in {f.name for f in contract.fields}]
    if missing or extra:
        raise SchemaContractError(f"missing={missing} extra={extra}")
    for f in contract.fields:
        got = actual[f.name]
        if got.dataType != f.dataType:
            raise SchemaContractError(
                f"column {f.name}: expected {f.dataType.simpleString()}, got {got.dataType.simpleString()}"
            )
        if strict_nullability and got.nullable and not f.nullable:
            raise SchemaContractError(f"column {f.name}: expected NOT NULL")
    return df.select(*[f.name for f in contract.fields])
