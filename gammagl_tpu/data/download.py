"""Download / extraction helpers (reference: gammagl/data/{download,extract}.py).

In network-less environments `download_url` raises a clear error; dataset
tests use pre-placed raw files or synthetic datasets instead.
"""

import os
import os.path as osp
import ssl
import sys
import tarfile
import urllib.request
import zipfile

__all__ = ["download_url", "extract_zip", "extract_tar", "extract_gz"]


def download_url(url: str, folder: str, log: bool = True, filename=None):
    """Fetch ``url`` into ``folder``; returns the file path.

    Reference: gammagl/data/download.py:12.
    """
    filename = filename or url.rpartition("/")[2].split("?")[0]
    path = osp.join(folder, filename)
    if osp.exists(path):
        return path
    os.makedirs(folder, exist_ok=True)
    if log:
        print(f"Downloading {url}", file=sys.stderr)
    ctx = ssl._create_unverified_context()
    data = urllib.request.urlopen(url, context=ctx)
    with open(path, "wb") as f:
        while True:
            chunk = data.read(10 * 1024 * 1024)
            if not chunk:
                break
            f.write(chunk)
    return path


def extract_zip(path, folder):
    with zipfile.ZipFile(path, "r") as f:
        f.extractall(folder)


def extract_tar(path, folder, mode="r:gz"):
    with tarfile.open(path, mode) as f:
        f.extractall(folder)


def extract_gz(path, folder):
    import gzip
    import shutil
    out = osp.join(folder, osp.basename(path).replace(".gz", ""))
    with gzip.open(path, "rb") as fin, open(out, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    return out
