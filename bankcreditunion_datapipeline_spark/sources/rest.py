"""REST API ingest adapter (SURVEY §2.1 S5): the FDIC institutions/financials
source shape, rebuilt engine-side.

The reference fetches pages single-threaded on the driver into a local JSON
spool file, then re-reads it with spark.read.json
(bronzeLayer/BankData.py:37-117, BuildBronzeLayer.py:169-181,
Helpers_FunctionsDicts.py:40-51 -- a multi-root JSON append, SURVEY §4.3#4).
Here pages are parsed straight into a DataFrame, and the fetcher is
injectable so tests run hermetically (no network).

Scale path: page *descriptors* (url+params) are distributed to executors via
mapInPandas so hundreds of pages download in parallel, bounded by partition
count, with the driver never touching payload bytes.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# A fetcher takes (url, params) and returns the decoded JSON body.
Fetcher = Callable[[str, dict], dict]


def default_fetcher(url: str, params: dict) -> dict:
    import requests

    resp = requests.get(url, params=params, timeout=60)
    resp.raise_for_status()
    return resp.json()


def fdic_page_params(
    endpoint: str,
    fields: Sequence[str],
    date_range: tuple[str, str] | None = None,
    cert_window: tuple[int, int] | None = None,
    limit: int = 10000,
) -> dict:
    """FDIC BankFind query params (shape per bronzeLayer/BankData.py:37-117):
    filters on CERT windows and REPDTE ranges, field projection, page limit.
    The watermark predicate (REPDTE:[prev TO now]) is pushed to the source --
    the API filters server-side, the engine never sees old rows."""
    filters = []
    if cert_window:
        filters.append(f"CERT:[{cert_window[0]} TO {cert_window[1]}]")
    if date_range:
        filters.append(f"REPDTE:[{date_range[0]} TO {date_range[1]}]")
    return {
        "filters": " AND ".join(filters),
        "fields": ",".join(fields),
        "sort_by": "CERT",
        "sort_order": "ASC",
        "limit": limit,
        "format": "json",
    }


def fetch_pages_to_df(
    spark: SparkSession,
    url: str,
    param_pages: list[dict],
    schema: StructType,
    fetcher: Fetcher = default_fetcher,
    record_path: str = "data",
) -> DataFrame:
    """Driver-side fan-in for small page counts: fetch each page, pull the
    nested record payload (the FDIC `data` struct -- flattened here directly
    instead of the reference's to_json/json_tuple string round-trip,
    bronzeLayer/BuildBronzeLayer.py:182-184), build ONE DataFrame."""
    rows: list[dict] = []
    for params in param_pages:
        body = fetcher(url, params)
        for rec in body.get("data", []):
            payload = rec.get(record_path, rec) if isinstance(rec, dict) else rec
            rows.append(payload)
    return spark.createDataFrame(rows, schema)


def fetch_pages_distributed(
    spark: SparkSession,
    url: str,
    param_pages: list[dict],
    schema: StructType,
    fetcher: Fetcher = default_fetcher,
    record_path: str = "data",
) -> DataFrame:
    """Scale path: one partition per page descriptor, fetched on executors
    via mapInPandas (Arrow-batched). Driver handles only descriptors."""
    import pandas as pd

    desc_df = spark.createDataFrame(
        [(url, json.dumps(p)) for p in param_pages], "url string, params string"
    ).repartition(len(param_pages))

    def fetch_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                body = fetcher(row["url"], json.loads(row["params"]))
                for rec in body.get("data", []):
                    payload = rec.get(record_path, rec) if isinstance(rec, dict) else rec
                    out.append(payload)
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return desc_df.mapInPandas(fetch_batch, schema)
