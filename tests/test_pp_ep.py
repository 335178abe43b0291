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
