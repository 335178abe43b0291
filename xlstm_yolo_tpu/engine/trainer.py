"""Trainer — one jit'd SPMD train step over a device mesh.

Re-design of reference ``engine/trainer.py`` (BaseTrainer :59). What maps
where:
  * DDP subprocess relaunch + NCCL (:198-229) -> a (dp, tp, sp) Mesh; the
    batch is dp-sharded, params replicated; XLA emits the gradient psum.
  * AMP GradScaler (:264-272) -> bf16 compute, fp32 params/optimizer — no
    scaler needed on TPU.
  * grad accumulate to nbs=64 (:378) -> optax.MultiSteps.
  * grad clip max_norm 0.5 (:594, fork value; upstream 10) -> clip_by_global_norm.
  * EMA with warmup ramp (:287) -> functional pytree EMA inside the step.
  * warmup LR interp (:366-376) -> host-side scalar fed to the step.
  * mosaic close (:357) -> loader hyp flip at epochs - close_mosaic.
  * CSV metrics, checkpoint last/best, resume, EarlyStopping — kept.

The whole step (forward, loss+TAL, backward, optimizer, EMA) is ONE compiled
XLA program; the python epoch loop only feeds batches and logs.
"""
from __future__ import annotations

import csv
import math
import time
from pathlib import Path
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..cfg import get_cfg
from ..parallel import mesh as M
from ..utils import LOGGER
from ..utils import train_utils as TU
from ..utils.checkpoint import save_checkpoint


class Trainer:
    def __init__(self, model, overrides: dict | None = None, callbacks=None):
        from ..utils.callbacks import default_callbacks

        overrides = {k: v for k, v in (overrides or {}).items() if v is not None}
        self.args = get_cfg(overrides=overrides)
        self.model = model
        self.variables = None
        self.epoch = 0
        self.start_epoch = 0
        self.best_fitness = 0.0
        self.metrics = None
        self.save_dir = Path(self.args.project or "runs/detect") / (self.args.name or "train")
        self.csv = self.save_dir / "results.csv"
        self.callbacks = callbacks if callbacks is not None else default_callbacks()
        # open-vocab (world) training: a list[str] -> (n, C) text tower used
        # by the MultiModalDataset to attach txt_feats to every batch
        # (reference WorldTrainer clip encode, models/yolo/world/train.py)
        self.text_encoder = None

    def add_callback(self, event: str, func) -> None:
        self.callbacks.add(event, func)

    def run_callbacks(self, event: str) -> None:
        """Fire all callbacks for ``event`` with this trainer (reference
        engine/trainer.py:157)."""
        self.callbacks.run(event, self)

    # ------------------------------------------------------------------
    def _build_step(self, mesh, accumulate: int):
        model = self.model
        hyp = self.args

        # single-flatten step update: clip + decay + optimizer + lr-scale +
        # apply + EMA chain on ONE ravel of each tree (TU.build_flat_step —
        # the separate build_optimizer + fused_apply_ema form raveled 5x
        # per step, each 200-leaf concat latency-bound)
        step_update, opt_init, opt_name, lr0, momentum = TU.build_flat_step(
            self.variables["params"], name=self.args.optimizer, lr=self.args.lr0,
            momentum=self.args.momentum, decay=self.args.weight_decay, nc=model.nc,
            iterations=self.iterations,
            clip_norm=0.5,  # fork quirk: 0.5 not 10; fused into the flat domain
            accumulate=accumulate,
        )
        self.lr0 = lr0 if self.args.optimizer == "auto" else self.args.lr0
        self.opt_name = opt_name

        # device-side augmentation: geometric + photometric stages run as XLA
        # ops fused into the step (data/device_augment.py) — the host (one
        # CPU core here) only letterboxes. Keyed off n_updates for
        # reproducibility; mosaic prob is a traced scalar (close_mosaic).
        dev_aug = bool(getattr(self.args, "device_augment", False))
        if dev_aug and model.task not in ("detect", "segment", "pose"):
            # the XLA augment path warps img/cls_boxes/mask plus slot-encoded
            # seg masks and keypoints; rotated OBB corners and classify/world
            # text slots are not geometry it understands — host augment
            # handles those tasks correctly, so fall back to it.
            LOGGER.warning(
                f"device_augment supports detect/segment/pose (got "
                f"'{model.task}'); falling back to host augmentation")
            dev_aug = False
        if dev_aug:
            from ..data.device_augment import _device_augment_jit

            aug_keys = ("mosaic", "degrees", "translate", "scale", "shear",
                        "hsv_h", "hsv_s", "hsv_v", "fliplr")
            aug_hyp = tuple(sorted(
                (k, float(getattr(self.args, k))) for k in aug_keys
                if getattr(self.args, k, None) is not None))
            aug_base_key = jax.random.PRNGKey(int(self.args.seed) + 7919)
            aug_flip_idx = None
            if model.task == "pose":
                fi = (self.data or {}).get("flip_idx") if hasattr(self, "data") else None
                aug_flip_idx = tuple(int(x) for x in fi) if fi else None

        # bf16 mixed precision (dtype cfg key): activations compute in bf16
        # (modules take dtype from their input; norms/loss stay fp32
        # internally), params/optimizer/EMA stay fp32 — the TPU equivalent
        # of the reference's AMP GradScaler path (no scaler needed: bf16
        # keeps fp32's exponent range).
        amp = str(getattr(self.args, "dtype", "bfloat16")) == "bfloat16"

        def train_step(params, batch_stats, opt_state, ema_params, n_updates, batch, lr):
            if batch["img"].dtype == jnp.uint8:
                # uint8 ships 4x fewer bytes host->device (the measured
                # train-loop bottleneck, bench_train.py --loop); normalize
                # in-graph
                batch = {**batch, "img": batch["img"].astype(jnp.float32) / 255.0}
            if dev_aug:
                akey = jax.random.fold_in(aug_base_key, n_updates)
                res = _device_augment_jit(
                    batch["img"] * 255.0, batch["cls_boxes"], batch["mask"],
                    akey, batch["mosaic_p"], aug_hyp,
                    seg_masks=batch.get("masks"), kpts=batch.get("keypoints"),
                    flip_idx=aug_flip_idx)
                img, cb, mk = res[:3]
                batch = {**batch, "img": img / 255.0, "cls_boxes": cb, "mask": mk}
                i = 3
                if "masks" in batch:
                    batch["masks"] = res[i]
                    i += 1
                if "keypoints" in batch:
                    batch["keypoints"] = res[i]
                batch.pop("mosaic_p", None)
            if amp:  # after augmentation (its geometry runs fp32)
                batch = {**batch, "img": batch["img"].astype(jnp.bfloat16)}

            def loss_fn(p):
                (total, aux), updates = model.loss(
                    {"params": p, "batch_stats": batch_stats}, batch, hyp=hyp, train=True
                )
                return total, (aux, updates)

            (total, (aux, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            new_bs = updates.get("batch_stats", batch_stats)
            n_updates = n_updates + 1
            params, ema_params, opt_state = step_update(
                grads, opt_state, params, ema_params, lr, n_updates)
            metrics = {"loss": total, **aux}
            return params, new_bs, opt_state, ema_params, n_updates, metrics

        return jax.jit(train_step, donate_argnums=(0, 1, 2, 3)), opt_init

    # ------------------------------------------------------------------
    def train(self):
        args = self.args
        # multi-host bootstrap (no-op single host); rank only picks the data
        # shard — every process runs this same function (SPMD)
        from ..parallel.distributed import ensure_initialized, is_main_process

        ensure_initialized()
        self._main = is_main_process()
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.run_callbacks("on_pretrain_routine_start")

        # data ------------------------------------------------------------
        from ..data.dataset import build_dataloader

        imgsz = int(args.imgsz)
        batch = int(args.batch)
        # mirror _build_step's non-detect fallback: when device_augment is
        # refused there, the HOST pipeline must keep augmenting — otherwise
        # the run would silently train with no augmentation at all
        dev_aug = (bool(getattr(args, "device_augment", False))
                   and self.model.task in ("detect", "segment", "pose"))
        self.loader, data_dict = build_dataloader(
            args.data, "train", batch=batch, imgsz=imgsz, hyp=vars(args),
            max_labels=int(args.max_labels), seed=int(args.seed),
            fraction=float(args.fraction), single_cls=bool(args.single_cls),
            task=self.model.task, embed_fn=self.text_encoder,
            # with device-side augmentation the host path is letterbox-only
            augment=False if dev_aug else None,
            cache=getattr(args, "cache", False),
            workers=int(getattr(args, "workers", 0) or 0),
        )
        self.data = data_dict
        if hasattr(self.loader.ds, "uint8_images"):
            # train batches ship uint8; the jit'd step normalizes on device
            self.loader.ds.uint8_images = True
        if self.model.nc != data_dict["nc"]:
            # reference behavior: the trainer rebuilds the model with the
            # dataset's nc (models/yolo/detect/train.py get_model(nc=data
            # ["nc"])) and transfers intersecting weights (nn/tasks.py:284
            # intersect_dicts) — the class head re-initializes.
            from ..nn.tasks import TaskModel

            LOGGER.info(
                f"rebuilding model with nc={data_dict['nc']} to match the dataset "
                f"(was nc={self.model.nc})")
            new_model = TaskModel(self.model.yaml, nc=data_dict["nc"], verbose=False)
            if self.variables is not None:
                new_vars = new_model.init(int(args.seed), imgsz=imgsz)
                old_flat = dict(jax.tree_util.tree_flatten_with_path(self.variables)[0])
                new_flat, treedef = jax.tree_util.tree_flatten_with_path(new_vars)
                moved = [old_flat[p] if p in old_flat and old_flat[p].shape == v.shape
                         else v for p, v in new_flat]
                n_hit = sum(1 for p, v in new_flat
                            if p in old_flat and old_flat[p].shape == v.shape)
                LOGGER.info(f"transferred {n_hit}/{len(new_flat)} weight tensors")
                self.variables = jax.tree_util.tree_unflatten(treedef, moved)
            self.model = new_model
        self.model.names = data_dict["names"] or self.model.names

        # mesh + state ------------------------------------------------------
        tp, sp = int(args.mesh_tp), int(args.mesh_sp)
        pp, ep = int(getattr(args, "mesh_pp", 1)), int(getattr(args, "mesh_ep", 1))
        dp = int(args.mesh_dp)
        if dp == -1:
            dp = len(jax.devices()) // (tp * sp * pp * ep)
        dp_want = dp
        while dp > 1 and batch % dp != 0:  # dp must divide the global batch
            dp -= 1
        if dp != dp_want:
            LOGGER.warning(
                f"batch={batch} is not divisible by dp={dp_want}; shrinking to "
                f"dp={dp} — {(dp_want - dp) * tp * sp * pp * ep} device(s) will "
                f"sit IDLE. Pick batch as a multiple of dp to use every chip.")
        mesh = M.build_mesh(dp=dp, tp=tp, sp=sp, pp=pp, ep=ep,
                            devices=jax.devices()[: dp * tp * sp * pp * ep])
        self.mesh = mesh
        if pp > 1:
            # stacked-param GPipe over the ViL trunk (nn/tasks.py
            # enable_pipeline) — must precede init: the param layout changes
            n_piped = self.model.enable_pipeline(
                mesh, microbatches=int(getattr(args, "pp_microbatches", 0)))
            print(f"pipeline parallelism: {n_piped} ViL stage(s) over pp={pp}")
        if self.variables is None:
            self.variables = self.model.init(int(args.seed), imgsz=imgsz)
        nb = len(self.loader)
        epochs = int(args.epochs)
        self.iterations = math.ceil(nb / max(round(args.nbs / batch), 1)) * epochs
        accumulate = max(round(args.nbs / batch), 1)

        # resume (reference check_resume/resume_training, trainer.py:697-754)
        resume_opt = None
        if args.resume:
            from ..utils.checkpoint import load_checkpoint, load_optimizer_state

            rp = Path(args.resume) if isinstance(args.resume, str) else self.save_dir / "last.ckpt"
            _, state, meta = load_checkpoint(rp, use_ema=False)
            self.variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
            self.start_epoch = int(meta.get("epoch", -1)) + 1
            self.best_fitness = float(meta.get("best_fitness", 0.0))
            resume_opt = rp
            print(f"resuming from {rp} at epoch {self.start_epoch}")

        step_fn, opt_init = self._build_step(mesh, accumulate)
        params = M.shard_params(mesh, self.variables["params"])
        batch_stats = M.shard_params(mesh, self.variables["batch_stats"])
        opt_state = opt_init(params)
        if resume_opt is not None:
            from ..utils.checkpoint import load_optimizer_state

            restored = load_optimizer_state(resume_opt, opt_state)
            if restored is not None:
                opt_state = restored
        ema_params = jax.tree.map(jnp.copy, params)  # real copy: params are donated separately
        n_updates = jnp.zeros((), jnp.int32)

        # multi-scale training (reference preprocess_batch,
        # /root/reference/models/yolo/detect/train.py:57-74: every batch is
        # rescaled to a random stride-aligned size in [0.5, 1.5]*imgsz).
        # TPU adaptation: a STATIC bucket set of 5 stride-aligned sizes —
        # each size is one XLA program (like rect-val), the host rotates
        # among them per step; the continuous-uniform draw would compile an
        # unbounded program set.
        ms = getattr(args, "multi_scale", False)
        ms = 0.5 if ms is True else float(ms or 0.0)
        self._ms_sizes_used: set = set()
        ms_sizes: list[int] = []
        if ms > 0:
            gs = max(32, int(max(self.model.strides)))
            ms_sizes = sorted({max(gs, int(round(imgsz * f / gs)) * gs)
                               for f in (1 - ms, 1 - ms / 2, 1.0, 1 + ms / 2, 1 + ms)})
            ms_rng = np.random.default_rng(int(args.seed) + 4242)
            mask_ratio = int(getattr(self.loader.ds, "mask_ratio", 4) or 4)
            LOGGER.info(f"multi_scale={ms}: rotating batch sizes {ms_sizes} "
                        f"(one XLA program each)")

            import functools

            @functools.partial(jax.jit, static_argnames="sz")
            def _ms_rescale(batch, sz):
                f = sz / imgsz
                out = dict(batch)
                img = batch["img"]
                if img.dtype == jnp.uint8:  # normalize before interpolation
                    img = img.astype(jnp.float32) / 255.0
                out["img"] = jax.image.resize(
                    img, (img.shape[0], sz, sz, img.shape[3]), "bilinear")
                if "cls_boxes" in batch:  # (B, M, 5|6): cls + pixel coords
                    cb = batch["cls_boxes"]
                    out["cls_boxes"] = jnp.concatenate(
                        [cb[..., :1], cb[..., 1:5] * f, cb[..., 5:]], -1)
                if "masks" in batch:  # overlap-encoded ints: nearest resize
                    m = batch["masks"]
                    out["masks"] = jax.image.resize(
                        m, (m.shape[0], sz // mask_ratio, sz // mask_ratio),
                        "nearest")
                if "keypoints" in batch:
                    kp = batch["keypoints"]
                    out["keypoints"] = jnp.concatenate(
                        [kp[..., :2] * f, kp[..., 2:]], -1)
                return out

        sched = TU.lr_schedule(self.lr0, args.lrf, epochs, cos_lr=bool(args.cos_lr))
        # reference floors warmup at 100 steps (trainer.py:340); cap it at half
        # the run so tiny datasets don't spend the whole schedule warming up
        warmup_steps = (
            min(max(round(args.warmup_epochs * nb), 100), max(epochs * nb // 2, 1))
            if args.warmup_epochs > 0 else 0
        )
        stopper = TU.EarlyStopping(patience=int(args.patience))

        print(f"training {self.model.task} model: {epochs} epochs x {nb} batches "
              f"(batch {batch}, imgsz {imgsz}, optimizer {self.opt_name}, lr0 {self.lr0}, "
              f"mesh dp={mesh.shape['dp']} tp={mesh.shape['tp']} sp={mesh.shape['sp']})")

        self.run_callbacks("on_pretrain_routine_end")
        self.run_callbacks("on_train_start")

        # preemption safety: TPU pods can be reclaimed mid-run; SIGTERM/SIGINT
        # request a checkpoint at the next step boundary instead of dying with
        # unsaved state (the reference has no elastic story, SURVEY.md §5)
        import signal

        self._preempted = False

        def _request_save(signum, frame):
            self._preempted = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _request_save)
            except ValueError:  # non-main thread
                pass

        # optional profiler trace of the first few steps of epoch 0
        # (jax.profiler -> TensorBoard/XProf, the reference's profile=True)
        prof_steps = 3 if bool(getattr(args, "profile", False)) else 0
        if prof_steps:
            jax.profiler.start_trace(str(self.save_dir / "profile"))

        step = self.start_epoch * nb
        t_start = time.time()
        means = {"loss": float("nan")}
        val_metrics = {}
        for epoch in range(self.start_epoch, epochs):
            self.epoch = epoch
            self.run_callbacks("on_train_epoch_start")
            if args.close_mosaic and epoch == max(epochs - int(args.close_mosaic), 0):
                if isinstance(self.loader.ds.hyp, dict):
                    self.loader.ds.hyp["mosaic"] = 0.0
                self._mosaic_p = 0.0
            epoch_metrics = []
            t0 = time.time()
            for batch_data in self.loader:
                self.run_callbacks("on_train_batch_start")
                base_lr = sched(epoch)
                lr = TU.warmup_lr(step, epoch, warmup_steps, base_lr, args.warmup_bias_lr)
                batch_data.pop("texts", None)  # host-only strings (world task)
                if dev_aug:
                    batch_data["mosaic_p"] = np.float32(
                        getattr(self, "_mosaic_p", float(args.mosaic)))
                db = M.shard_batch(mesh, batch_data)
                if ms_sizes:
                    sz = int(ms_rng.choice(ms_sizes))
                    self._ms_sizes_used.add(sz)
                    if sz != imgsz:
                        db = _ms_rescale(db, sz)
                params, batch_stats, opt_state, ema_params, n_updates, metrics = step_fn(
                    params, batch_stats, opt_state, ema_params, n_updates, db, jnp.float32(lr)
                )
                epoch_metrics.append(metrics)
                step += 1
                if prof_steps and step >= self.start_epoch * nb + prof_steps:
                    jax.profiler.stop_trace()
                    prof_steps = 0
                # optimizer + zero-grad are fused inside the XLA step; the hooks
                # still fire for API parity (reference trainer.py:591-599)
                self.run_callbacks("optimizer_step")
                self.run_callbacks("on_before_zero_grad")
                if self._preempted:
                    break
                self.run_callbacks("on_train_batch_end")
            if self._preempted:
                print("preemption signal received — checkpointing and stopping")
                self._save("last", params, batch_stats, ema_params, epoch,
                           opt_state=opt_state)
                break
            means = {k: float(np.mean([float(m[k]) for m in epoch_metrics])) for k in epoch_metrics[0]}
            dt = time.time() - t0
            imps = nb * batch / dt

            # validation -----------------------------------------------------
            fitness = None
            val_metrics = {}
            if args.val:
                from .validator import Validator

                # plots on the last epoch only (reference plots final val)
                v = Validator(self.model, data=self.data, imgsz=imgsz, max_labels=int(args.max_labels),
                              callbacks=self.callbacks,
                              plots=bool(args.plots) and epoch == epochs - 1,
                              save_dir=self.save_dir)
                val_metrics = v({"params": ema_params, "batch_stats": batch_stats})
                fitness = val_metrics.get("fitness", 0.0)
                if fitness >= self.best_fitness:
                    self.best_fitness = fitness
                    self._save("best", params, batch_stats, ema_params, epoch)
            row = {"epoch": epoch, **{f"train/{k}": v for k, v in means.items()},
                   **{f"metrics/{k}": v for k, v in val_metrics.items()}, "lr": lr,
                   "img_s": round(imps, 1)}
            self._log_csv(row)
            self.run_callbacks("on_train_epoch_end")
            self.run_callbacks("on_fit_epoch_end")
            print(f"epoch {epoch + 1}/{epochs}: loss {means['loss']:.3f} "
                  f"(box {means.get('box', 0):.3f} cls {means.get('cls', 0):.3f} "
                  f"dfl {means.get('dfl', 0):.3f}) {imps:.0f} img/s"
                  + (f" | fitness {fitness:.4f}" if fitness is not None else ""))

            self._save("last", params, batch_stats, ema_params, epoch, opt_state=opt_state)
            if stopper(epoch, fitness):
                print(f"early stopping at epoch {epoch} (best {stopper.best_epoch})")
                break

        if prof_steps:  # run shorter than the requested trace
            jax.profiler.stop_trace()
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        self.variables = {"params": jax.device_get(ema_params), "batch_stats": jax.device_get(batch_stats)}
        # the raw (non-EMA) weights, for diagnostics and EMA-vs-raw eval audits
        self.raw_params = jax.device_get(params)
        self.metrics = val_metrics if args.val else {"train_loss": means["loss"]}
        self.run_callbacks("on_params_update")
        self.run_callbacks("on_train_end")
        print(f"done in {(time.time() - t_start) / 3600:.2f} h; results -> {self.save_dir}")
        self.run_callbacks("teardown")
        return self.metrics

    # ------------------------------------------------------------------
    def _save(self, name, params, batch_stats, ema_params, epoch, opt_state=None):
        if not self.args.save or not getattr(self, "_main", True):
            return  # rank-0-only ckpt like the reference (trainer.py:427-442)
        self.run_callbacks("on_model_save")
        save_checkpoint(
            self.save_dir / f"{name}.ckpt",
            self.model,
            {"params": jax.device_get(params), "batch_stats": jax.device_get(batch_stats)},
            epoch=epoch,
            best_fitness=self.best_fitness,
            train_args={k: v for k, v in vars(self.args).items() if isinstance(v, (int, float, str, bool))},
            ema_params=jax.device_get(ema_params),
            optimizer_state=jax.device_get(opt_state) if opt_state is not None else None,
        )

    def _log_csv(self, row: dict):
        if not getattr(self, "_main", True):
            return
        new = not self.csv.exists()
        with open(self.csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row.keys()))
            if new:
                w.writeheader()
            w.writerow(row)
