"""Foundation utilities (reference ``utils/__init__.py``, 1349 LoC):
logging, settings persistence, env detection, retry/except decorators,
thread helpers. JAX-process-aware where the reference is DDP-rank-aware.
"""
from __future__ import annotations

import contextlib
import functools
import json
import logging
import os
import platform
import sys
import threading
import time
from pathlib import Path

__all__ = [
    "LOGGER", "RANK", "LOCAL_RANK", "SETTINGS", "SettingsManager", "TryExcept",
    "Retry", "ThreadingLocked", "threaded", "colorstr", "yaml_load", "yaml_save",
    "increment_path", "is_colab", "is_kaggle", "is_docker", "emojis",
]

# process indices: under multi-host JAX these come from jax.distributed;
# fall back to the env convention the reference uses (utils/__init__.py:33-34)
RANK = int(os.getenv("RANK", -1))
LOCAL_RANK = int(os.getenv("LOCAL_RANK", -1))


def set_logging(name: str = "xlstm_yolo_tpu", verbose: bool = True) -> logging.Logger:
    """Rank-aware logger (reference utils/__init__.py:347)."""
    level = logging.INFO if verbose and RANK in (-1, 0) else logging.ERROR
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter("%(message)s"))
        h.setLevel(level)
        logger.addHandler(h)
    logger.propagate = False
    return logger


LOGGER = set_logging()


def emojis(s: str) -> str:
    """Platform-safe emoji handling (reference utils/__init__.py)."""
    return s.encode().decode("ascii", "ignore") if platform.system() == "Windows" else s


def colorstr(*input):
    """Colorize terminal strings: colorstr('blue', 'bold', 'hello')."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m", "yellow": "\033[33m",
        "blue": "\033[34m", "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
        "bright_red": "\033[91m", "bright_green": "\033[92m", "bright_yellow": "\033[93m",
        "bold": "\033[1m", "underline": "\033[4m", "end": "\033[0m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


class TryExcept(contextlib.ContextDecorator):
    """Context/decorator that logs instead of raising (reference :915)."""

    def __init__(self, msg: str = "", verbose: bool = True):
        self.msg = msg
        self.verbose = verbose

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, traceback):
        if self.verbose and value:
            LOGGER.warning(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True


class Retry:
    """Retry decorator with exponential backoff (reference :950)."""

    def __init__(self, times: int = 3, delay: float = 2.0):
        self.times = times
        self.delay = delay

    def __call__(self, func):
        @functools.wraps(func)
        def wrapped(*args, **kwargs):
            attempts = 0
            while True:
                try:
                    return func(*args, **kwargs)
                except Exception:
                    attempts += 1
                    if attempts > self.times:
                        raise
                    time.sleep(self.delay * (2 ** (attempts - 1)))

        return wrapped


class ThreadingLocked:
    """Per-function mutex decorator (reference :420)."""

    def __init__(self):
        self.lock = threading.Lock()

    def __call__(self, f):
        @functools.wraps(f)
        def wrapped(*args, **kwargs):
            with self.lock:
                return f(*args, **kwargs)

        return wrapped


def threaded(func):
    """Run decorated function in a daemon thread (reference :430)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        t = threading.Thread(target=func, args=args, kwargs=kwargs, daemon=True)
        t.start()
        return t

    return wrapper


# env detection (reference :539-763) -----------------------------------------

def is_colab() -> bool:
    return "COLAB_RELEASE_TAG" in os.environ or "COLAB_BACKEND_VERSION" in os.environ


def is_kaggle() -> bool:
    return os.environ.get("PWD") == "/kaggle/working"


def is_docker() -> bool:
    return Path("/.dockerenv").exists()


def is_pytest_running() -> bool:
    return "PYTEST_CURRENT_TEST" in os.environ or "pytest" in sys.modules


TESTS_RUNNING = is_pytest_running()


# yaml + paths ----------------------------------------------------------------
from ..cfg import yaml_load, yaml_save  # noqa: E402,F401


def increment_path(path: str | Path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2, exp3... (reference utils/files.py increment_path)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        base, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = Path(f"{base}{sep}{n}{suffix}")
            if not p.exists():
                path = p
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


# persistent user settings ----------------------------------------------------

class SettingsManager(dict):
    """JSON-backed settings (reference SettingsManager, utils/__init__.py:1173)."""

    DEFAULTS = {
        "settings_version": "0.1.0",
        "datasets_dir": "datasets",
        "weights_dir": "weights",
        "runs_dir": "runs",
        "sync": False,
        "tensorboard": True,
    }

    def __init__(self, file: str | Path | None = None):
        super().__init__(self.DEFAULTS)
        root = Path(os.getenv("XLSTM_YOLO_CONFIG_DIR", Path.home() / ".config" / "xlstm_yolo_tpu"))
        self.file = Path(file) if file else root / "settings.json"
        if self.file.exists():
            with contextlib.suppress(Exception):
                self.update(json.loads(self.file.read_text()))

    def save(self):
        self.file.parent.mkdir(parents=True, exist_ok=True)
        self.file.write_text(json.dumps(dict(self), indent=2))

    def update(self, *args, **kwargs):
        super().update(*args, **kwargs)

    def reset(self):
        self.clear()
        super().update(self.DEFAULTS)
        self.save()


SETTINGS = SettingsManager()
