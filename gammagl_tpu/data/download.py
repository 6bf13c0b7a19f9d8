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

__all__ = ["download_url", "extract_zip", "extract_tar", "extract_gz",
           "offline", "network_available"]


def network_available(host: str = "github.com", timeout: float = 3.0):
    """Best-effort fast connectivity probe.

    DNS resolution is not bounded by socket timeouts (glibc getaddrinfo
    can hang on a blackholing resolver), so the lookup runs in a daemon
    thread with a deadline; a hung resolver costs ``timeout`` seconds
    once instead of stalling the caller indefinitely.
    """
    if offline():
        return False
    import socket
    import threading
    result = []

    def probe():
        try:
            result.append(socket.gethostbyname(host))
        except OSError:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout)
    return bool(result)


def offline() -> bool:
    """True when downloads are disabled (``GGL_TPU_OFFLINE=1``).

    A blackholing network (DNS that hangs instead of refusing) would
    otherwise stall every dataset constructor; trainers set this to fall
    back to bundled/synthetic data immediately.
    """
    return os.environ.get("GGL_TPU_OFFLINE", "0") not in ("", "0")


def download_url(url: str, folder: str, log: bool = True, filename=None,
                 timeout: float = 15.0):
    """Fetch ``url`` into ``folder``; returns the file path.

    Reference: gammagl/data/download.py:12. Unlike the reference, the
    socket carries a hard ``timeout`` and ``GGL_TPU_OFFLINE=1``
    short-circuits with OSError before touching the network.
    """
    filename = filename or url.rpartition("/")[2].split("?")[0]
    path = osp.join(folder, filename)
    if osp.exists(path):
        return path
    if offline():
        raise OSError(f"GGL_TPU_OFFLINE=1: refusing to download {url}")
    os.makedirs(folder, exist_ok=True)
    if log:
        print(f"Downloading {url}", file=sys.stderr)
    ctx = ssl._create_unverified_context()
    data = urllib.request.urlopen(url, context=ctx, timeout=timeout)
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
