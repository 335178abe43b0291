"""utils/files.py + utils/downloads.py + engine callback wiring."""
import os
from pathlib import Path

import numpy as np
import pytest

from xlstm_yolo_tpu.utils import files as F
from xlstm_yolo_tpu.utils import downloads as D
from xlstm_yolo_tpu.utils.callbacks import Callbacks, HOOKS, default_callbacks


pytestmark = pytest.mark.slow


def test_working_directory(tmp_path):
    cwd = Path.cwd()
    with F.WorkingDirectory(tmp_path):
        assert Path.cwd() == tmp_path
    assert Path.cwd() == cwd


def test_spaces_in_path(tmp_path):
    d = tmp_path / "with space"
    d.mkdir()
    (d / "a.txt").write_text("hi")
    with F.spaces_in_path(d) as safe:
        assert " " not in str(safe)
        (Path(safe) / "b.txt").write_text("new")
    assert (d / "b.txt").read_text() == "new"  # synced back


def test_file_probes(tmp_path):
    f = tmp_path / "x.bin"
    f.write_bytes(b"\0" * 2048)
    assert F.file_age(f) == 0
    assert len(F.file_date(f).split("-")) == 3
    assert F.file_size(f) == pytest.approx(2048 / (1 << 20))
    assert F.file_size(tmp_path) >= F.file_size(f)


def test_get_latest_run(tmp_path):
    run = tmp_path / "exp1" / "last.ckpt"
    run.mkdir(parents=True)
    (run / "meta.yaml").write_text("{}")
    assert F.get_latest_run(str(tmp_path)).endswith("last.ckpt")
    assert F.get_latest_run(str(tmp_path / "empty")) == ""


def test_zip_unzip_roundtrip(tmp_path):
    src = tmp_path / "proj"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("alpha")
    (src / "sub" / "b.txt").write_text("beta")
    (src / ".DS_Store").write_text("junk")
    z = D.zip_directory(src, progress=False)
    assert z.exists()
    out = D.unzip_file(z, tmp_path / "out", progress=False)
    assert (out / "a.txt").read_text() == "alpha"
    assert (out / "sub" / "b.txt").read_text() == "beta"
    assert not (out / ".DS_Store").exists()


def test_unzip_rejects_traversal(tmp_path):
    import zipfile

    z = tmp_path / "evil.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("../evil.txt", "boom")
    with pytest.raises(ValueError, match="unsafe"):
        D.unzip_file(z, tmp_path / "out", progress=False)


def test_is_url_and_url2file():
    assert D.is_url("https://example.com/a/b.zip")
    assert not D.is_url("not a url")
    assert D.url2file("https://example.com/a/weights.ckpt?x=1") == "weights.ckpt"


def test_check_disk_space_offline(tmp_path):
    assert D.check_disk_space(required_bytes=1)  # tiny: fits
    with pytest.raises(MemoryError):
        D.check_disk_space(required_bytes=10**18, hard=True)


def test_attempt_download_asset_local(tmp_path, monkeypatch):
    w = tmp_path / "model.ckpt"
    w.write_text("x")
    monkeypatch.setenv("XLSTM_YOLO_ASSETS", str(tmp_path))
    assert D.attempt_download_asset("model.ckpt") == str(tmp_path / "model.ckpt")
    with pytest.raises(FileNotFoundError, match="egress"):
        D.attempt_download_asset("missing.ckpt")


def test_callbacks_hooks_complete():
    # the reference registers 24 lifecycle hooks (utils/callbacks/base.py:144-174)
    assert len(HOOKS) >= 24
    for h in ("optimizer_step", "teardown", "on_model_save", "on_params_update"):
        assert h in HOOKS
    cb = Callbacks()
    seen = []
    cb.add("on_train_start", lambda t: seen.append(t))
    cb.run("on_train_start", "X")
    assert seen == ["X"]
    with pytest.raises(KeyError):
        cb.add("nonsense_hook", print)


def test_trainer_fires_callbacks(tmp_path):
    from xlstm_yolo_tpu.data.synthetic import make_synthetic_dataset
    from xlstm_yolo_tpu.engine.model import Model

    from xlstm_yolo_tpu.engine.trainer import Trainer
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    data_yaml = make_synthetic_dataset(tmp_path, n_train=4, n_val=2, imgsz=64)
    cb = default_callbacks()
    fired = []
    for h in HOOKS:
        cb.add(h, (lambda hh: lambda *a, **k: fired.append(hh))(h))
    tr = Trainer(TaskModel("yolov8n.yaml", nc=3), overrides={
        "data": data_yaml, "epochs": 1, "imgsz": 64, "batch": 2, "val": True,
        "project": str(tmp_path / "runs"), "name": "cb", "max_labels": 16,
        "mosaic": 0.0, "warmup_epochs": 0.0, "nbs": 2, "seed": 0,
    }, callbacks=cb)
    tr.train()
    for h in ("on_pretrain_routine_start", "on_train_start", "on_train_epoch_start",
              "on_train_batch_start", "optimizer_step", "on_before_zero_grad",
              "on_train_batch_end", "on_train_epoch_end", "on_fit_epoch_end",
              "on_model_save", "on_val_start", "on_val_end", "on_params_update",
              "on_train_end", "teardown"):
        assert h in fired, f"hook {h} never fired"
