"""Driver-result frame construction (r14 optimization, guide §4/§6).

Operators that finish a computation on the driver (greedy picks,
iterative-curve rows, one-row graph summaries) return their O(k) result
list through ``spark.createDataFrame``.  The default list-of-tuples path
pickles rows through a Python RDD and runs ``applySchemaToPythonRDD`` --
measured 0.5-0.8s per call steady-state (plus ~2s first touch) on
local[32], pure fixed overhead for a handful of rows.  Routing the same
rows through a pandas DataFrame takes the Arrow conversion path instead
(0.14-0.30s measured) when ``spark.sql.execution.arrow.pyspark.enabled``
is on, and falls back to the identical non-Arrow pandas conversion when
it is off (the driver's plain session) -- both value-identical to the
list path: None survives as NULL in every column type because the frame
is built with ``dtype=object`` (a float column would otherwise coerce
None to NaN, which is NOT null under Arrow).

Rows must be tuples/lists matching the schema string positionally --
the same contract the list path already required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_result_frame(
    spark: SparkSession, rows: list, schema: str
) -> DataFrame:
    if not rows:
        return spark.createDataFrame([], schema)
    try:
        import pandas as pd
        from pyspark.sql.types import _parse_datatype_string
    except Exception:  # pragma: no cover - pandas is a hard dep in practice
        return spark.createDataFrame(rows, schema)
    names = [f.name for f in _parse_datatype_string(schema).fields]
    pdf = pd.DataFrame(rows, columns=names, dtype=object)
    return spark.createDataFrame(pdf, schema)
