"""Hermetic tests for the REST and zip-archive ingest adapters (fake
fetchers, no network)."""

from __future__ import annotations

import datetime
import io
import zipfile

from pyspark.sql.types import StringType, StructField, StructType

from bankcreditunion_datapipeline_spark.sources.archives import (
    download_quarters,
    ncua_archive_url,
    quarter_ends,
)
from bankcreditunion_datapipeline_spark.sources.rest import (
    fdic_page_params,
    fetch_pages_distributed,
    fetch_pages_to_df,
)

INST_SCHEMA = StructType(
    [
        StructField("CERT", StringType()),
        StructField("NAME", StringType()),
        StructField("STNAME", StringType()),
    ]
)


def _fake_fdic(url, params):
    lo, hi = 0, 10**9
    if "CERT:[" in params.get("filters", ""):
        part = params["filters"].split("CERT:[")[1].split("]")[0]
        lo, hi = (int(x) for x in part.split(" TO "))
    banks = [
        {"CERT": "101", "NAME": "A Bank", "STNAME": "Virginia"},
        {"CERT": "5005", "NAME": "B Bank", "STNAME": "Texas"},
        {"CERT": "15001", "NAME": "C Bank", "STNAME": "Ohio"},
    ]
    return {"data": [{"data": b} for b in banks if lo <= int(b["CERT"]) <= hi]}


def test_fdic_page_params_predicates():
    p = fdic_page_params(
        "institutions", ["CERT", "NAME"], date_range=("2020-01-01", "2020-06-30"),
        cert_window=(0, 9999),
    )
    assert "CERT:[0 TO 9999]" in p["filters"]
    assert "REPDTE:[2020-01-01 TO 2020-06-30]" in p["filters"]
    assert p["limit"] == 10000


def test_fetch_pages_to_df_windows(spark):
    pages = [
        fdic_page_params("institutions", ["CERT"], cert_window=(w, w + 9999))
        for w in range(0, 20000, 10000)
    ]
    df = fetch_pages_to_df(spark, "http://fake", pages, INST_SCHEMA, fetcher=_fake_fdic)
    certs = sorted(r.CERT for r in df.collect())
    assert certs == ["101", "15001", "5005"]  # all windows covered, no dupes


def test_fetch_pages_distributed_matches_driver_side(spark):
    pages = [
        fdic_page_params("institutions", ["CERT"], cert_window=(w, w + 9999))
        for w in range(0, 20000, 10000)
    ]

    # local def: cloudpickle ships it by value to executors (a module-level
    # test function isn't importable on Python workers)
    def fake_fdic(url, params):
        banks = [
            {"CERT": "101", "NAME": "A Bank", "STNAME": "Virginia"},
            {"CERT": "5005", "NAME": "B Bank", "STNAME": "Texas"},
            {"CERT": "15001", "NAME": "C Bank", "STNAME": "Ohio"},
        ]
        window = params.get("filters", "").split("CERT:[")[1].split("]")[0]
        lo, hi = (int(x) for x in window.split(" TO "))
        return {"data": [{"data": b} for b in banks if lo <= int(b["CERT"]) <= hi]}

    a = fetch_pages_to_df(spark, "http://fake", pages, INST_SCHEMA, fetcher=fake_fdic)
    b = fetch_pages_distributed(spark, "http://fake", pages, INST_SCHEMA, fetcher=fake_fdic)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _fake_zip(files: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content in files.items():
            zf.writestr(name, content)
    return buf.getvalue()


def test_quarter_ends_enumeration():
    qs = list(quarter_ends(datetime.date(2020, 3, 31), end=datetime.date(2021, 1, 15)))
    assert qs == [
        datetime.date(2020, 6, 30),
        datetime.date(2020, 9, 30),
        datetime.date(2020, 12, 31),
    ]


def test_download_quarters_stops_at_404(tmp_path):
    published = {
        "2020-06": _fake_zip({"foicu.csv": "CU_NUMBER\n1", "fs220.csv": "CU_NUMBER\n1"}),
        "2020-09": _fake_zip({"foicu.csv": "CU_NUMBER\n2", "fs220.csv": "CU_NUMBER\n2"}),
    }
    calls = []

    def fetcher(url):
        calls.append(url)
        for key, payload in published.items():
            if key in url:
                return payload
        return None  # 404

    out = download_quarters(
        datetime.date(2020, 3, 31),
        str(tmp_path),
        url_for=lambda q: ncua_archive_url(q, "http://fake"),
        fetcher=fetcher,
    )
    assert sorted(q.isoformat() for q in out) == ["2020-06-30", "2020-09-30"]
    # ONE GET per quarter (the reference issued 3, SURVEY §4.3#4), stop at 404
    assert len(calls) == 3
    assert all(len(paths) == 2 for paths in out.values())
