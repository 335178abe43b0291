"""Filesystem helpers.

TPU-native analogue of the reference's ``utils/files.py`` (reference
utils/files.py:13-199): working-directory context, space-safe path shim,
run-dir increment, file age/size probes and latest-run discovery. The
``update_models`` re-serializer becomes a checkpoint re-save through our
msgpack checkpoint layer instead of torch.save.
"""
from __future__ import annotations

import contextlib
import glob
import os
import shutil
import tempfile
from datetime import datetime
from pathlib import Path

from . import LOGGER, increment_path  # re-export increment_path here too

__all__ = (
    "WorkingDirectory",
    "spaces_in_path",
    "increment_path",
    "file_age",
    "file_date",
    "file_size",
    "get_latest_run",
    "update_models",
)


class WorkingDirectory(contextlib.ContextDecorator):
    """Chdir into ``new_dir`` for the duration of a context or decorated call.

    Mirrors reference utils/files.py:13 (usable as decorator or context manager).
    """

    def __init__(self, new_dir: str | Path):
        self.dir = new_dir
        self.cwd = Path.cwd().resolve()

    def __enter__(self):
        os.chdir(self.dir)
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        os.chdir(self.cwd)


@contextlib.contextmanager
def spaces_in_path(path: str | Path):
    """If ``path`` contains spaces, yield a space-free temp copy and sync back.

    Some external tools choke on spaces; the reference works around it the
    same way (utils/files.py:56). Directories are copied recursively, files
    singly; on exit any copy is synced back to the original location.
    """
    if " " not in str(path):
        yield path
        return
    string = isinstance(path, str)
    path = Path(path)
    with tempfile.TemporaryDirectory() as tmp:
        tmp_path = Path(tmp) / path.name.replace(" ", "_")
        if path.is_dir():
            shutil.copytree(path, tmp_path)
        elif path.is_file():
            tmp_path.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(path, tmp_path)
        try:
            yield str(tmp_path) if string else tmp_path
        finally:
            if tmp_path.is_dir():
                shutil.copytree(tmp_path, path, dirs_exist_ok=True)
            elif tmp_path.is_file():
                shutil.copy2(tmp_path, path)


def file_age(path: str | Path = __file__) -> int:
    """Days since last modification (reference utils/files.py:156)."""
    dt = datetime.now() - datetime.fromtimestamp(Path(path).stat().st_mtime)
    return dt.days


def file_date(path: str | Path = __file__) -> str:
    """Human-readable modification date 'YYYY-M-D' (reference utils/files.py:162)."""
    t = datetime.fromtimestamp(Path(path).stat().st_mtime)
    return f"{t.year}-{t.month}-{t.day}"


def file_size(path: str | Path) -> float:
    """File or directory size in MB (reference utils/files.py:168)."""
    path = Path(path)
    mb = 1 << 20
    if path.is_file():
        return path.stat().st_size / mb
    if path.is_dir():
        return sum(f.stat().st_size for f in path.glob("**/*") if f.is_file()) / mb
    return 0.0


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent ``last.ckpt`` directory under ``search_dir`` for --resume
    (reference utils/files.py:180 looks for last*.pt; ours are ckpt dirs)."""
    last_list = [
        os.path.dirname(m) for m in glob.glob(f"{search_dir}/**/last*.ckpt/meta.yaml", recursive=True)
    ]
    return max(last_list, key=os.path.getctime) if last_list else ""


def update_models(model_names=("yolov8n.ckpt",), source_dir: Path = Path("."), update_names: bool = False):
    """Re-save checkpoints into ``source_dir/updated_models`` via the current
    checkpoint layer — strips optimizer state for deployment, the analogue of
    the reference's strip_optimizer pass in update_models (utils/files.py:186)."""
    from .checkpoint import load_checkpoint, save_checkpoint

    target_dir = Path(source_dir) / "updated_models"
    target_dir.mkdir(parents=True, exist_ok=True)
    for name in model_names:
        src = Path(source_dir) / name
        if not (src / "meta.yaml").exists():
            LOGGER.warning(f"update_models: {src} not found, skipping")
            continue
        model, state, meta = load_checkpoint(src, use_ema=True)
        if update_names and meta.get("train_args", {}).get("names"):
            model.names = meta["train_args"]["names"]
        dst = target_dir / name
        save_checkpoint(
            dst, model,
            {"params": state["params"], "batch_stats": state["batch_stats"]},
            epoch=-1, best_fitness=meta.get("best_fitness", 0.0),
            train_args=meta.get("train_args", {}),
        )
        LOGGER.info(f"update_models: re-saved {src} -> {dst}")
