"""Zip-archive ingest adapter (SURVEY §2.1 S6): the NCUA quarterly
call-report source shape.

The reference downloads one zip per quarter in a driver loop until a 404,
extracts CSVs to local disk, then scans them
(bronzeLayer/CreditUnionData.py:21-67 -- including 3 duplicate GETs per
iteration, SURVEY §4.3#4). Rebuilt: injectable fetcher, one GET per
quarter, quarter enumeration is data (a generator), extraction goes to a
staging dir that the CSV scan (sources.files.read_csv) consumes.

Scale path note: for many/large archives, land the zips on object storage
and read via Spark's `binaryFile` source + a mapInPandas unzip, so
extraction runs on executors. Driver-side staging is fine for the
reference's ~1 zip/quarter cadence.
"""

from __future__ import annotations

import io
import os
import zipfile
from collections.abc import Callable, Iterator
from datetime import date

# Takes a URL, returns archive bytes, or None for 404 (quarter not published).
ArchiveFetcher = Callable[[str], bytes | None]


def default_archive_fetcher(url: str) -> bytes | None:
    import requests

    resp = requests.get(url, timeout=300)
    if resp.status_code == 404:
        return None
    resp.raise_for_status()
    return resp.content


def quarter_ends(start: date, end: date | None = None) -> Iterator[date]:
    """Enumerate quarter-end dates from `start` (exclusive) forward --
    the data-driven version of the reference's quarter-advance loop
    (bronzeLayer/DataRunParams.py:73-81, minus its month-map bug)."""
    end = end or date.today()
    y, q = start.year, (start.month - 1) // 3 + 1
    while True:
        q += 1
        if q == 5:
            y, q = y + 1, 1
        m_end, d_end = {1: (3, 31), 2: (6, 30), 3: (9, 30), 4: (12, 31)}[q]
        nxt = date(y, m_end, d_end)
        if nxt > end:
            return
        yield nxt


def ncua_archive_url(quarter_end: date, base: str) -> str:
    """NCUA call-report archive naming: call-report-data-YYYY-MM.zip."""
    return f"{base}/call-report-data-{quarter_end.year}-{quarter_end.month:02d}.zip"


def extract_archive(payload: bytes, dest_dir: str, members: list[str] | None = None) -> list[str]:
    """Extract (selected) members of a zip payload to dest_dir; returns paths."""
    out = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        names = members or zf.namelist()
        for name in names:
            zf.extract(name, dest_dir)
            out.append(os.path.join(dest_dir, name))
    return out


def download_quarters(
    start: date,
    staging_dir: str,
    url_for: Callable[[date], str],
    fetcher: ArchiveFetcher = default_archive_fetcher,
    members: list[str] | None = None,
    end: date | None = None,
) -> dict[date, list[str]]:
    """Fetch each unpublished quarter's archive until the source 404s
    (reference semantics: stop at the first missing quarter,
    bronzeLayer/CreditUnionData.py:57-66). ONE GET per quarter.
    Returns {quarter_end: [extracted csv paths]}."""
    results: dict[date, list[str]] = {}
    for q_end in quarter_ends(start, end):
        payload = fetcher(url_for(q_end))
        if payload is None:
            break
        qdir = os.path.join(staging_dir, q_end.isoformat())
        os.makedirs(qdir, exist_ok=True)
        results[q_end] = extract_archive(payload, qdir, members)
    return results
