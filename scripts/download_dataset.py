"""Download + extract the Middlebury 'other' dataset.

Equivalent of the reference's scripts/download_dataset.py:1-37 (HTTP GET of
the zip, in-memory extract). This environment has no network egress, so when
the download fails the script falls back to the copy bundled with the
reference snapshot if present.
"""

from __future__ import annotations

import argparse
import io
import os
import shutil
import sys
import zipfile

URL = "https://vision.middlebury.edu/flow/data/comp/zip/other-gray-allframes.zip"
BUNDLED = "/root/reference/data/gray"


def download_and_extract_zip(url: str, dest: str) -> bool:
    try:
        import requests

        print(f"downloading {url} ...")
        r = requests.get(url, timeout=60)
        r.raise_for_status()
        with zipfile.ZipFile(io.BytesIO(r.content)) as zf:
            zf.extractall(dest)
        return True
    except Exception as e:  # no egress / missing requests
        print(f"download failed ({e})", file=sys.stderr)
        return False


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dest", default="data/gray")
    args = parser.parse_args(argv)
    os.makedirs(args.dest, exist_ok=True)
    if download_and_extract_zip(URL, args.dest):
        print(f"extracted to {args.dest}")
        return 0
    if os.path.isdir(BUNDLED):
        print(f"falling back to bundled copy {BUNDLED}")
        shutil.copytree(BUNDLED, args.dest, dirs_exist_ok=True)
        return 0
    print("no data source available", file=sys.stderr)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
