"""End-to-end ingest tests against a REAL local HTTP server (a socket, not
an in-process fake): the FDIC-shaped paged REST loop with the default
requests-based fetcher, and the NCUA-shaped quarterly zip loop with its
404-stop semantics (reference behavior: bronzeLayer/BankData.py:37-117,
bronzeLayer/CreditUnionData.py:57-66)."""

from __future__ import annotations

import datetime
import io
import json
import threading
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from pyspark.sql.types import StringType, StructField, StructType

from bankcreditunion_datapipeline_spark.sources.archives import (
    default_archive_fetcher,
    download_quarters,
    ncua_archive_url,
)
from bankcreditunion_datapipeline_spark.sources.files import read_csv_inferred
from bankcreditunion_datapipeline_spark.sources.rest import (
    default_fetcher,
    fdic_page_params,
    fetch_pages_distributed,
    fetch_pages_to_df,
)

BANKS = [
    {"CERT": str(cert), "NAME": f"Bank {cert}", "STNAME": "Virginia"}
    for cert in range(100, 125)
]
INST_SCHEMA = StructType(
    [
        StructField("CERT", StringType()),
        StructField("NAME", StringType()),
        StructField("STNAME", StringType()),
    ]
)
PUBLISHED_QUARTERS = {"2023-03", "2023-06", "2023-09"}  # 2023-12 -> 404-stop


def _quarter_zip(tag: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "FOICU.csv", "CU_NUMBER,CU_NAME\n1,Alpha FCU\n2,Beta FCU\n"
        )
        zf.writestr("Acct-Desc.csv", f"ACCT,DESC\n010,Assets {tag}\n")
    return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # keep pytest output clean
        pass

    def do_GET(self):
        parsed = urlparse(self.path)
        if parsed.path == "/api/institutions":
            qs = {k: v[0] for k, v in parse_qs(parsed.query).items()}
            lo, hi = 0, 10**9
            if "CERT:[" in qs.get("filters", ""):
                part = qs["filters"].split("CERT:[")[1].split("]")[0]
                lo, hi = (int(x) for x in part.split(" TO "))
            rows = [b for b in BANKS if lo <= int(b["CERT"]) <= hi]
            rows = rows[: int(qs.get("limit", 10000))]
            body = json.dumps({"data": [{"data": b} for b in rows]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif parsed.path.startswith("/archives/call-report-data-"):
            tag = parsed.path.rsplit("call-report-data-", 1)[1].removesuffix(".zip")
            if tag not in PUBLISHED_QUARTERS:
                self.send_response(404)
                self.end_headers()
                return
            body = _quarter_zip(tag)
            self.send_response(200)
            self.send_header("Content-Type", "application/zip")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture(scope="module")
def server_url():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _pages():
    # 25 banks, CERT windows of 10 -> 3 pages (last short), like the
    # reference's CERT-window paging.
    return [
        fdic_page_params("institutions", ["CERT", "NAME", "STNAME"],
                         cert_window=(w, w + 9))
        for w in range(100, 130, 10)
    ]


def test_rest_paging_over_real_socket(spark, server_url):
    df = fetch_pages_to_df(
        spark, f"{server_url}/api/institutions", _pages(), INST_SCHEMA,
        fetcher=default_fetcher,
    )
    certs = sorted(r.CERT for r in df.collect())
    assert certs == sorted(b["CERT"] for b in BANKS)


def test_rest_distributed_fetch_over_real_socket(spark, server_url):
    df = fetch_pages_distributed(
        spark, f"{server_url}/api/institutions", _pages(), INST_SCHEMA,
        fetcher=default_fetcher,
    )
    certs = sorted(r.CERT for r in df.collect())
    assert certs == sorted(b["CERT"] for b in BANKS)


def test_archive_quarter_loop_stops_at_404(spark, server_url, tmp_path):
    res = download_quarters(
        start=datetime.date(2022, 12, 31),
        staging_dir=str(tmp_path),
        url_for=lambda q: ncua_archive_url(q, f"{server_url}/archives"),
        fetcher=default_archive_fetcher,
        end=datetime.date(2024, 6, 30),
    )
    # three published quarters downloaded; loop stopped at the 2023-12 404
    # even though later quarters exist in the enumeration window
    assert [q.isoformat() for q in sorted(res)] == [
        "2023-03-31", "2023-06-30", "2023-09-30"
    ]
    for paths in res.values():
        assert {p.rsplit("/", 1)[1] for p in paths} == {"FOICU.csv", "Acct-Desc.csv"}
    # extracted CSVs are scannable by the bronze CSV reader
    foicu = read_csv_inferred(spark, [p for p in res[datetime.date(2023, 3, 31)]
                                      if p.endswith("FOICU.csv")][0])
    assert foicu.count() == 2 and "CU_NAME" in foicu.columns
