from .files import (  # noqa: F401
    read_csv_inferred,
    read_json,
    read_parquet,
    read_testdata,
    testdata_tables,
)
