"""mLSTM kernel equivalence tests: parallel == recurrent == chunkwise.

The three forms are independent derivations of the same recurrence
(reference math: xlstm/blocks/mlstm/backends.py); agreement across them is
the correctness argument for the chunkwise workhorse, and the chunkwise jnp
form is in turn the golden model for the Pallas kernel.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.kernels import mlstm_native as K


pytestmark = pytest.mark.smoke


def _rand_inputs(B=2, NH=3, S=32, DH=16, seed=0, gate_scale=1.0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, NH, S, DH)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, NH, S, DH)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, NH, S, DH)), jnp.float32)
    i = jnp.asarray(rng.normal(size=(B, NH, S)) * gate_scale, jnp.float32)
    f = jnp.asarray(rng.normal(size=(B, NH, S)) * gate_scale + 2.0, jnp.float32)
    return q, k, v, i, f


@pytest.mark.parametrize("igate_act", ["exp", "sigmoid"])
def test_parallel_vs_recurrent(igate_act):
    q, k, v, i, f = _rand_inputs()
    hp = K.mlstm_parallel(q, k, v, i, f, igate_act=igate_act)
    hr = K.mlstm_recurrent(q, k, v, i, f, igate_act=igate_act)
    np.testing.assert_allclose(hp, hr, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("igate_act", ["exp", "sigmoid"])
@pytest.mark.parametrize("chunk_size", [8, 16, 32])
def test_chunkwise_vs_recurrent(igate_act, chunk_size):
    q, k, v, i, f = _rand_inputs(S=64)
    hc = K.mlstm_chunkwise(q, k, v, i, f, chunk_size=chunk_size, igate_act=igate_act)
    hr = K.mlstm_recurrent(q, k, v, i, f, igate_act=igate_act)
    np.testing.assert_allclose(hc, hr, rtol=3e-4, atol=3e-4)


def test_chunkwise_full_seq_equals_parallel():
    # chunk_size == S: single chunk must equal the parallel form
    q, k, v, i, f = _rand_inputs(S=32)
    hc = K.mlstm_chunkwise(q, k, v, i, f, chunk_size=32)
    hp = K.mlstm_parallel(q, k, v, i, f)
    np.testing.assert_allclose(hc, hp, rtol=2e-4, atol=2e-4)


def test_chunkwise_state_carry():
    # processing [S1 | S2] with carried state == processing S1+S2 at once
    q, k, v, i, f = _rand_inputs(S=64)
    full = K.mlstm_chunkwise(q, k, v, i, f, chunk_size=16)
    h1, state = K.mlstm_chunkwise(
        q[:, :, :32], k[:, :, :32], v[:, :, :32], i[:, :, :32], f[:, :, :32],
        chunk_size=16, return_last_state=True,
    )
    h2 = K.mlstm_chunkwise(
        q[:, :, 32:], k[:, :, 32:], v[:, :, 32:], i[:, :, 32:], f[:, :, 32:],
        chunk_size=16, initial_state=state,
    )
    np.testing.assert_allclose(jnp.concatenate([h1, h2], axis=2), full, rtol=3e-4, atol=3e-4)


def test_recurrent_step_api():
    B, NH, DH = 2, 3, 16
    rng = np.random.default_rng(1)
    c = jnp.zeros((B, NH, DH, DH))
    n = jnp.zeros((B, NH, DH))
    m = jnp.zeros((B, NH))
    q = jnp.asarray(rng.normal(size=(B, NH, DH)), jnp.float32)
    h, (c2, n2, m2) = K.mlstm_recurrent_step(c, n, m, q, q, q, jnp.zeros((B, NH)), jnp.zeros((B, NH)))
    assert h.shape == (B, NH, DH)
    assert c2.shape == (B, NH, DH, DH)
    assert bool(jnp.isfinite(h).all())


def test_extreme_gates_stable():
    # very negative input gates (the fork inits igate bias to -10) and large
    # forget gates must not produce NaN/inf anywhere
    q, k, v, i, f = _rand_inputs(S=32)
    i = i - 10.0
    f = f + 6.0
    for fn in (
        lambda: K.mlstm_parallel(q, k, v, i, f),
        lambda: K.mlstm_chunkwise(q, k, v, i, f, chunk_size=8),
        lambda: K.mlstm_recurrent(q, k, v, i, f),
    ):
        h = fn()
        assert bool(jnp.isfinite(h).all())


def test_chunkwise_grads_finite():
    q, k, v, i, f = _rand_inputs(S=32)

    def loss(q, k, v, i, f):
        return jnp.sum(K.mlstm_chunkwise(q, k, v, i, f, chunk_size=8) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, i, f)
    for g in grads:
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).sum()) > 0


def test_soft_cap():
    x = jnp.asarray([-100.0, 0.0, 100.0])
    y = K.soft_cap(x, 15.0)
    np.testing.assert_allclose(y, [-15.0, 0.0, 15.0], atol=1e-3)
    assert K.soft_cap(x, None) is x
