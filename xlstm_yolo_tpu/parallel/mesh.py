"""Device mesh + sharding helpers — the SPMD replacement for the reference's
DDP stack (SURVEY.md §2.11: subprocess relaunch + NCCL + DistributedSampler,
``utils/dist.py``, ``engine/trainer.py:218-229``).

One jit'd train step over a ``Mesh`` with axes:
  * ``dp`` — data parallel (batch axis). Gradients are reduced by XLA
    automatically because params are replicated and the loss averages over a
    dp-sharded batch — no explicit allreduce, no loss×world_size scaling.
  * ``tp`` — tensor parallel over the mLSTM heads axis (NH) and conv channel
    dim for the widest layers.
  * ``sp`` — sequence parallel over the mLSTM chunk axis: the chunkwise form
    carries only small (DH × DH) states across chunks, so sharding S costs
    one small collective per boundary (SURVEY.md §5 long-context note).

On a single host this still works (mesh of local devices); multi-host uses
``jax.distributed.initialize`` before building the mesh.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(dp: int = -1, tp: int = 1, sp: int = 1, pp: int = 1, ep: int = 1,
               devices=None) -> Mesh:
    """Create a (dp, tp, sp, pp, ep) mesh. dp = -1 fills with remaining
    devices. pp pipelines stacked block groups (parallel/pipeline.py); ep
    shards MoE expert weights (parallel/moe.py). Size-1 axes cost nothing —
    the mesh always carries all five names so sharding specs stay uniform."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        dp = n // (tp * sp * pp * ep)
    assert dp * tp * sp * pp * ep == n, f"mesh {dp}x{tp}x{sp}x{pp}x{ep} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp, sp, pp, ep)
    return Mesh(arr, axis_names=("dp", "tp", "sp", "pp", "ep"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: sharded over dp, replicated elsewhere."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the dp-sharded layout; scalars (e.g. the
    mosaic_p augmentation gate) replicate.

    Multi-host: each process holds only its LOCAL slice of the global batch
    (the Loader shards by process, parallel/distributed.py:local_shard), so
    the global array is assembled with make_array_from_process_local_data —
    the SPMD replacement for DistributedSampler + DDP scatter."""
    s = batch_sharding(mesh)
    r = replicated(mesh)
    multi = jax.process_count() > 1

    def put(x):
        if not getattr(x, "ndim", np.ndim(x)):
            return jax.device_put(x, r)
        if multi:
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.device_put(x, s)

    return jax.tree.map(put, batch)


def param_sharding_rules(mesh: Mesh, params):
    """Sharding tree for parameters.

    Data-parallel-first design: parameters are replicated (YOLO-scale models
    fit comfortably per chip). When tp > 1, ViL/xLSTM layers get
    Megatron-style paired shardings so each layer needs a single reduction
    (inserted by XLA) after ``proj_down``:

      * ``proj_up`` — column-parallel: kernel (D, 2·ED) over its OUTPUT axis,
        bias sharded to match. Downstream per-head tensors then flow sharded.
      * headwise q/k/v (``LinearHeadwiseExpand`` weight (NH, DH, DH)) and the
        i/f gate Dense outputs (…, NH) — sharded over the HEADS axis, the
        natural tp axis of the mLSTM (each device runs NH/tp full heads).
      * ``proj_down`` — row-parallel: kernel (ED, D) over its INPUT axis;
        bias replicated (applied once after the psum).
      * per-head norm scales / learnable_skip (flat (NH·DH,)) follow tp.

    Anything else: wide conv/dense kernels (>= 256 out-channels) shard over
    their output-channel axis; the rest replicates. GSPMD propagates the
    activation shardings and inserts the collectives.
    """
    tp = mesh.shape["tp"]

    COL = ("proj_up", "ffn_proj_up", "igate", "fgate")  # output-axis sharded
    ROW = ("proj_down", "ffn_proj_down")  # input-axis sharded
    # (NH, ...) headwise weights: q/k/v everywhere; the sLSTM layer's four
    # gates are LinearHeadwiseExpand too (nn/xlstm.py:69-72)
    HEADWISE = ("q_proj", "k_proj", "v_proj", "igate", "fgate", "zgate", "ogate")
    FLAT_TP = ("learnable_skip",)

    pp = mesh.shape.get("pp", 1)
    ep = mesh.shape.get("ep", 1)

    def rule(path, x):
        if not hasattr(x, "ndim"):
            return NamedSharding(mesh, P())
        names = [getattr(p, "key", str(p)) for p in path]
        # pipelined ViL pair stacks: leading axis = total pairs, sharded
        # over pp so each rank holds its stage's blocks (nn/vil_blocks.py)
        if pp > 1 and "pairs" in names and x.ndim >= 1 and x.shape[0] % pp == 0:
            return NamedSharding(mesh, P("pp", *([None] * (x.ndim - 1))))
        # MoE expert weights: leading E axis over ep (parallel/moe.py)
        if ep > 1 and names[-1] in ("w_gate", "w_up", "w_down") \
                and x.ndim >= 1 and x.shape[0] % ep == 0:
            return NamedSharding(mesh, P("ep", *([None] * (x.ndim - 1))))
        if tp <= 1:
            return NamedSharding(mesh, P())
        mod, leaf = (names[-2] if len(names) > 1 else ""), names[-1]
        if mod in COL:
            if leaf == "kernel" and x.ndim == 2 and x.shape[1] % tp == 0:
                return NamedSharding(mesh, P(None, "tp"))
            if leaf == "bias" and x.shape[0] % tp == 0:
                return NamedSharding(mesh, P("tp"))
        if mod in ROW and leaf == "kernel" and x.ndim == 2 and x.shape[0] % tp == 0:
            return NamedSharding(mesh, P("tp", None))
        if mod in HEADWISE and leaf == "weight" and x.ndim == 3 and x.shape[0] % tp == 0:
            return NamedSharding(mesh, P("tp", None, None))
        if mod in HEADWISE and leaf == "bias" and x.shape[0] % tp == 0:
            return NamedSharding(mesh, P("tp"))
        if leaf in FLAT_TP and x.ndim == 1 and x.shape[0] % tp == 0:
            return NamedSharding(mesh, P("tp"))
        if x.ndim >= 2 and x.shape[-1] % tp == 0 and x.shape[-1] >= 256:
            spec = [None] * x.ndim
            spec[-1] = "tp"
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(mesh: Mesh, params):
    shardings = param_sharding_rules(mesh, params)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)
