"""Validation checks (reference ``utils/checks.py``, 822 LoC).

Covers the load-bearing subset: version parsing/comparison, image-size
stride rounding, suffix/YAML/file checks, and a numerics self-test
(``check_bf16`` — the TPU analogue of the reference's ``check_amp`` CUDA
fp16 trial forward, utils/checks.py check_amp / engine/trainer.py:263).
Auto-pip-install (check_requirements) is deliberately absent: this deploys
in zero-egress environments, so missing optional deps gate features off
instead of installing at runtime.
"""
from __future__ import annotations

import re
from pathlib import Path

from . import LOGGER


def parse_version(version: str = "0.0.0") -> tuple:
    """'2.0.1+cpu' -> (2, 0, 1) (reference checks.py parse_version)."""
    try:
        return tuple(int(x) for x in re.findall(r"\d+", version)[:3])
    except Exception:
        return (0, 0, 0)


def check_version(current: str = "0.0.0", required: str = "0.0.0",
                  name: str = "version", hard: bool = False) -> bool:
    """Compare version strings against a requirement spec like
    '>=8.0,<9.0' (reference checks.py check_version)."""
    if not current or not required:
        return True
    c = parse_version(current)
    ok = True
    for clause in required.strip(" ").split(","):
        m = re.match(r"([^0-9]*)([\d.]+)", clause.strip())
        if not m:
            continue
        op, ver = m.group(1).strip() or ">=", parse_version(m.group(2))
        ok &= {
            "==": c == ver, "!=": c != ver, ">=": c >= ver,
            "<=": c <= ver, ">": c > ver, "<": c < ver,
        }.get(op, True)
    if not ok:
        msg = f"{name} {required} required, but {name}=={current} is installed"
        if hard:
            raise ModuleNotFoundError(msg)
        LOGGER.warning(msg)
    return ok


def check_imgsz(imgsz, stride: int = 32, min_dim: int = 1, max_dim: int = 2,
                floor: int = 0):
    """Round image size up to a stride multiple (reference checks.py
    check_imgsz): int -> int; [h, w] -> [h', w']."""
    stride = int(stride)
    if isinstance(imgsz, (int, float)):
        sizes = [int(imgsz)]
        scalar = True
    else:
        sizes = [int(x) for x in imgsz]
        scalar = False
    if len(sizes) > max_dim:
        raise ValueError(f"imgsz={imgsz} has more than {max_dim} dimensions")
    out = [max(int(-(-x // stride) * stride), floor) for x in sizes]
    if out != sizes:
        LOGGER.warning(f"imgsz={sizes} must be multiple of stride {stride}, updating to {out}")
    if scalar:
        return out[0]
    if min_dim == 2 and len(out) == 1:
        out = [out[0], out[0]]
    return out


def check_suffix(file, suffix=(".ckpt", ".yaml"), msg: str = ""):
    """Assert the file has an accepted suffix (reference checks.py check_suffix)."""
    if not file or not suffix:
        return
    if isinstance(suffix, str):
        suffix = (suffix,)
    for f in [file] if isinstance(file, (str, Path)) else file:
        s = Path(f).suffix.lower().strip()
        if s and s not in suffix:
            raise ValueError(f"{msg}{f} acceptable suffix is {suffix}, not {s}")


def check_yaml(file, suffix=(".yaml", ".yml")) -> str:
    """Resolve + suffix-check a YAML path (reference checks.py check_yaml)."""
    check_suffix(file, suffix)
    return check_file(file, suffix)


def check_file(file, suffix="") -> str:
    """Resolve a file path, searching the package cfg tree like the
    reference searches its package dir (checks.py check_file)."""
    if suffix:
        check_suffix(file, suffix)
    f = str(file).strip()
    if not f or Path(f).exists():
        return f
    root = Path(__file__).resolve().parent.parent / "cfg"
    hits = sorted(root.rglob(Path(f).name))
    if not hits:
        raise FileNotFoundError(f"'{f}' does not exist")
    return str(hits[0])


def check_is_path_safe(basedir, path) -> bool:
    """True iff path resolves inside basedir (reference checks.py
    check_is_path_safe — zip-slip guard)."""
    base = Path(basedir).resolve()
    target = Path(path).resolve()
    return target.parts[: len(base.parts)] == base.parts


def check_bf16(model=None, variables=None, imgsz: int = 64, tol: float = 0.05) -> bool:
    """Numerics self-test: fp32 vs bf16 forward agree within tolerance
    (TPU analogue of the reference's check_amp fp16 trial on bus.jpg,
    utils/checks.py; run by the trainer at startup, engine/trainer.py:263)."""
    import jax
    import jax.numpy as jnp

    if model is None:
        from ..nn.tasks import TaskModel

        model = TaskModel("yolov8n.yaml")
        variables = model.init(0, imgsz=imgsz)
    x = jnp.linspace(0, 1, imgsz * imgsz * 3, dtype=jnp.float32).reshape(1, imgsz, imgsz, 3)
    full = jax.jit(model.predictions)(variables, x)
    vb = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                      if a.dtype == jnp.float32 else a, variables)
    half = jax.jit(model.predictions)(vb, x.astype(jnp.bfloat16)).astype(jnp.float32)
    denom = jnp.clip(jnp.abs(full).max(), 1e-3, None)
    rel = float(jnp.abs(full - half).max() / denom)
    ok = rel < tol
    if not ok:
        LOGGER.warning(f"bf16 self-test failed: max rel err {rel:.4f} >= {tol}")
    return ok
