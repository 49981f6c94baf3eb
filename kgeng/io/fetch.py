"""Dataset-acquisition utilities (S4/S5 in SURVEY.md §2.1): chunked HTTP
download with append-resume for multi-part archives, and zstd+tar extract.

Both are driver-side, env-gated: this sandbox has no network and no
``zstandard`` wheel, so ``download`` raises unless a working ``requests``
session can reach the URL, and ``zstd_extract`` raises ImportError with a
clear message. The seams mirror ``benchmark_graphalytics.py:87-121``
(10 MB chunks, append mode for parts) and ``:169-176`` (copy_stream then
``tarfile.extractall``).
"""

from __future__ import annotations

import os
import tarfile

CHUNK = 10 * 1024 * 1024  # the reference's 10 MB download block


def download(url: str, filename: str, append: bool = False) -> str:
    """Chunked streaming download; ``append=True`` resumes multi-part
    archives by concatenation (the reference's BIG-dataset path)."""
    import requests

    mode = "ab" if append else "wb"
    with requests.get(url, stream=True, timeout=60) as r:
        r.raise_for_status()
        with open(filename, mode) as f:
            for chunk in r.iter_content(chunk_size=CHUNK):
                f.write(chunk)
    return filename


def zstd_extract(archive: str, out_dir: str) -> str:
    """Decompress a .tar.zst archive and extract it under ``out_dir``."""
    try:
        import zstandard
    except ImportError as e:  # pragma: no cover - env-gated
        raise ImportError(
            "zstandard is not installed in this environment; "
            "zstd archives cannot be extracted here") from e
    os.makedirs(out_dir, exist_ok=True)
    tar_path = archive[:-4] if archive.endswith(".zst") else archive + ".tar"
    with open(archive, "rb") as src, open(tar_path, "wb") as dst:
        zstandard.ZstdDecompressor().copy_stream(src, dst)
    tar_extract(tar_path, out_dir)
    return out_dir


def tar_extract(tar_path: str, out_dir: str) -> str:
    """Plain tar extraction (shared by the zstd path and tests)."""
    os.makedirs(out_dir, exist_ok=True)
    with tarfile.open(tar_path) as tf:
        tf.extractall(out_dir, filter="data")
    return out_dir
