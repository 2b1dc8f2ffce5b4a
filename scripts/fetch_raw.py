"""Ingest-shell step for S1: fetch raw CSVs over HTTP into the raw zone.

The reference pulls its source CSVs straight from GitHub inside the
ingestion notebook (01_dataLake_ingestion.ipynb:110-126, ``requests.get``
+ ``pd.read_csv(StringIO(...))`` on the driver). That is an ingest-time
shell concern, not an engine operator — a 100 TB pipeline lands raw
bytes onto distributed storage FIRST and lets every parse run
distributed from there. This helper is that landing step; the engine
side then reads the landed files with ``sources.read_csv`` (declared
schema, FAILFAST or quarantine mode).

Usage::

    python scripts/fetch_raw.py <url> [<url> ...] --out /path/to/raw_zone

Uses only the standard library (urllib) — the container has no
``requests``. Writes atomically (tmp + rename) so a partially
transferred file never looks landed.
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request
from urllib.parse import urlparse


def fetch(url: str, out_dir: str, timeout: float = 60.0) -> str:
    """Download ``url`` into ``out_dir`` (filename from the URL path),
    atomically. Returns the landed file path."""
    name = os.path.basename(urlparse(url).path) or "download"
    os.makedirs(out_dir, exist_ok=True)
    final = os.path.join(out_dir, name)
    tmp = final + ".part"
    with urllib.request.urlopen(url, timeout=timeout) as resp, open(tmp, "wb") as f:
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
    os.replace(tmp, final)
    return final


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("urls", nargs="+", help="raw file URLs to land")
    ap.add_argument("--out", required=True, help="raw-zone directory")
    args = ap.parse_args(argv)
    for url in args.urls:
        path = fetch(url, args.out)
        print(f"landed {url} -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
