"""Download / archive helpers.

Analogue of the reference's ``utils/downloads.py`` (reference
utils/downloads.py:38-530): URL probes, zip/unzip with exclusion lists, disk
space guard, retried download, and asset resolution. This build targets
air-gapped TPU pods, so network fetches go through ``urllib`` when egress
exists and degrade to a clear error (plus a local asset-directory search,
``$XLSTM_YOLO_ASSETS``) when it does not — no silent downloads, no pip installs.
"""
from __future__ import annotations

import os
import re
import shutil
import urllib.parse
import urllib.request
from pathlib import Path
from zipfile import ZipFile, is_zipfile

from . import LOGGER, Retry

__all__ = (
    "is_url",
    "url2file",
    "zip_directory",
    "unzip_file",
    "check_disk_space",
    "safe_download",
    "attempt_download_asset",
    "download",
    "GITHUB_ASSETS_STEMS",
)

# Model stems a bare name like "yolov8n" may refer to (reference
# downloads.py:19-35 builds the same list for its release assets).
GITHUB_ASSETS_STEMS = [
    f"yolov8{s}{x}" for s in "nsmlx" for x in ("", "-cls", "-seg", "-pose", "-obb")
] + [f"yolo11{s}" for s in "nsmlx"] + ["yolov3", "yolov5n", "yolov5s", "yolov6n", "yolov9c", "yolov10n"]


def is_url(url, check: bool = False) -> bool:
    """True if ``url`` parses as a URL; with ``check`` also probe reachability
    (reference downloads.py:38)."""
    try:
        url = str(url)
        result = urllib.parse.urlparse(url)
        if not all([result.scheme, result.netloc]):
            return False
        if check:
            with urllib.request.urlopen(url, timeout=5) as resp:  # noqa: S310
                return resp.getcode() == 200
        return True
    except Exception:
        return False


def url2file(url: str) -> str:
    """Filename part of a URL, query string stripped (reference downloads.py:278 area)."""
    return Path(urllib.parse.unquote(str(url))).name.split("?")[0]


def zip_directory(directory, compress: bool = True, exclude=(".DS_Store", "__MACOSX"), progress: bool = True) -> Path:
    """Zip a directory's contents into ``<directory>.zip``, skipping ``exclude``
    (reference downloads.py:94)."""
    import zipfile

    directory = Path(directory)
    if not directory.is_dir():
        raise FileNotFoundError(f"{directory} is not a directory")
    files = [f for f in directory.rglob("*") if f.is_file() and all(x not in f.name for x in exclude)]
    zip_file = directory.with_suffix(".zip")
    compression = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with ZipFile(zip_file, "w", compression) as zf:
        for f in files:
            zf.write(f, f.relative_to(directory))
    if progress:
        LOGGER.info(f"zipped {len(files)} files -> {zip_file}")
    return zip_file


def unzip_file(file, path=None, exclude=(".DS_Store", "__MACOSX"), exist_ok: bool = False, progress: bool = True) -> Path:
    """Unzip into ``path`` (default: alongside), creating a subdirectory when the
    archive has no single top-level folder; refuses path traversal
    (reference downloads.py:133)."""
    file = Path(file)
    if not is_zipfile(file):
        raise ValueError(f"{file} is not a valid zipfile")
    path = Path(path or file.parent)
    with ZipFile(file) as zf:
        names = [n for n in zf.namelist() if all(x not in n for x in exclude)]
        root = path.resolve()
        for n in names:  # zip-slip guard (prefix match alone would pass /dest_evil for /dest)
            try:
                (path / n).resolve().relative_to(root)
            except ValueError:
                raise ValueError(f"unsafe path in archive: {n}") from None
        top = {n.split("/")[0] for n in names}
        unzip_as_dir = len(top) > 1 or (len(names) > 1 and not names[0].endswith("/"))
        extract_path = (path / file.stem) if unzip_as_dir else path
        final = (path / list(top)[0]) if not unzip_as_dir else extract_path
        if final.exists() and any(final.iterdir()) and not exist_ok:
            if progress:
                LOGGER.info(f"skipping unzip (exists): {final}")
            return final
        for n in names:
            zf.extract(n, extract_path)
    if progress:
        LOGGER.info(f"unzipped {len(names)} files -> {final}")
    return final


def check_disk_space(url: str = "", path=Path.cwd(), sf: float = 1.5, hard: bool = True,
                     required_bytes: int | None = None) -> bool:
    """Ensure ``sf`` x the payload fits on the target filesystem (reference
    downloads.py:199 HEAD-probes Content-Length; offline callers pass
    ``required_bytes`` directly)."""
    size = required_bytes
    if size is None and url:
        try:
            req = urllib.request.Request(url, method="HEAD")
            with urllib.request.urlopen(req, timeout=5) as resp:  # noqa: S310
                size = int(resp.headers.get("Content-Length", 0))
        except Exception:
            return True  # can't probe -> don't block
    if not size:
        return True
    free = shutil.disk_usage(path).free
    if size * sf < free:
        return True
    msg = f"insufficient disk space: need {size * sf / 1e9:.1f} GB, free {free / 1e9:.1f} GB at {path}"
    if hard:
        raise MemoryError(msg)
    LOGGER.warning(msg)
    return False


def safe_download(url, file=None, dir=None, unzip: bool = True, delete: bool = False,
                  retry: int = 3, min_bytes: float = 1.0, exist_ok: bool = False,
                  progress: bool = True) -> Path:
    """Retried urllib download with size sanity check and optional unzip
    (reference downloads.py:278; curl/gdrive branches dropped — urllib only)."""
    f = Path(dir or ".") / (file or url2file(url)) if (dir or file) else Path(url2file(url))
    if f.is_file() and f.stat().st_size > min_bytes:
        pass  # already present
    else:
        f.parent.mkdir(parents=True, exist_ok=True)
        check_disk_space(url, path=f.parent, hard=True)

        @Retry(times=retry, delay=1.0)
        def _fetch():
            if progress:
                LOGGER.info(f"downloading {url} -> {f}")
            urllib.request.urlretrieve(url, f)  # noqa: S310
            if f.stat().st_size <= min_bytes:
                f.unlink(missing_ok=True)
                raise ConnectionError(f"download failed or too small: {url}")

        _fetch()
    if unzip and f.exists() and f.suffix in ("", ".zip", ".tar", ".gz"):
        if is_zipfile(f):
            out = unzip_file(f, dir or f.parent, exist_ok=exist_ok, progress=progress)
            if delete:
                f.unlink()
            return out
    return f


def attempt_download_asset(file, repo: str = "", release: str = "", **kwargs) -> str:
    """Resolve a model asset name to a local path.

    Air-gapped counterpart of reference downloads.py:412 (which pulls GitHub
    release assets): search, in order — the literal path, the current
    directory, ``$XLSTM_YOLO_ASSETS``, and ``SETTINGS['weights_dir']``. Raises
    with a clear message instead of attempting egress.
    """
    from . import SETTINGS

    file = str(file).strip()
    candidates = [Path(file), Path.cwd() / file]
    for env_dir in filter(None, [os.environ.get("XLSTM_YOLO_ASSETS"), SETTINGS.get("weights_dir")]):
        candidates.append(Path(env_dir) / file)
    for c in candidates:
        if c.exists():
            return str(c)
    if is_url(file):
        return str(safe_download(file, dir=SETTINGS.get("weights_dir", "weights")))
    raise FileNotFoundError(
        f"asset '{file}' not found locally (searched cwd, $XLSTM_YOLO_ASSETS, weights_dir). "
        "This build has no implicit network egress; place the file locally or pass a URL."
    )


def download(url, dir=Path.cwd(), unzip: bool = True, delete: bool = False,
             threads: int = 1, retry: int = 3, exist_ok: bool = False):
    """Download one or many URLs, optionally concurrently (reference downloads.py:466)."""
    urls = [url] if isinstance(url, (str, Path)) else list(url)
    dir = Path(dir)
    dir.mkdir(parents=True, exist_ok=True)
    if threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as pool:
            list(pool.map(lambda u: safe_download(u, dir=dir, unzip=unzip, delete=delete,
                                                  retry=retry, exist_ok=exist_ok), urls))
    else:
        for u in urls:
            safe_download(u, dir=dir, unzip=unzip, delete=delete, retry=retry, exist_ok=exist_ok)
