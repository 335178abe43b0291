"""Hand-derived chunkwise mLSTM backward (kernels/mlstm_bwd.py) vs autograd.

Frozen-stabilizer convention (the reference's Triton kernels do the same):
wherever the normalizer's exp(-stab) floor is inactive and eps is negligible,
the explicit gradients must EQUAL jax.vjp of the native chunkwise form —
stabilizer contributions cancel analytically. On adversarial inputs (random
sign qk -> floor active at ~1/3 of positions) the dropped floor-branch terms
bound the deviation to ~1e-2 relative on the gate grads only.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.kernels.mlstm_bwd import mlstm_chunkwise_bwd_ref
from xlstm_yolo_tpu.kernels.mlstm_native import mlstm_chunkwise


def _inputs(aligned: bool, seed=0, B=2, NH=2, S=32, DH=8, DV=12):
    r = np.random.default_rng(seed)
    q = jnp.asarray(r.normal(size=(B, NH, S, DH)), jnp.float32)
    k = (q + 0.1 * jnp.asarray(r.normal(size=(B, NH, S, DH)), jnp.float32)
         if aligned else jnp.asarray(r.normal(size=(B, NH, S, DH)), jnp.float32))
    v = jnp.asarray(r.normal(size=(B, NH, S, DV)), jnp.float32)
    i = jnp.asarray(r.normal(size=(B, NH, S)), jnp.float32)
    f = jnp.asarray(r.normal(size=(B, NH, S)) + 2, jnp.float32)
    dh = jnp.asarray(r.normal(size=(B, NH, S, DV)), jnp.float32)
    return q, k, v, i, f, dh


@pytest.mark.parametrize("igate_act", ["exp", "sigmoid"])
def test_bwd_matches_autograd_smooth_branch(igate_act):
    """Aligned q/k keeps |row| > exp(-stab): gradients exact to fp."""
    q, k, v, i, f, dh = _inputs(aligned=True)
    eps = 1e-12  # the +eps term breaks exact stab-cancellation at ~eps/|row|
    fn = lambda *a: mlstm_chunkwise(*a, chunk_size=8, igate_act=igate_act, eps=eps)
    _, vjp = jax.vjp(fn, q, k, v, i, f)
    want = vjp(dh)
    got = mlstm_chunkwise_bwd_ref(q, k, v, i, f, dh, chunk_size=8,
                                  igate_act=igate_act, eps=eps)
    for name, a, b in zip("qkvif", got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-5, err_msg=f"d{name}")


def test_bwd_adversarial_inputs_bounded():
    """Random-sign qk activates the normalizer floor: dq/dk/dv stay exact
    (they don't flow through the floor), gate grads deviate only by the
    dropped floor-branch stabilizer terms."""
    q, k, v, i, f, dh = _inputs(aligned=False, seed=1)
    fn = lambda *a: mlstm_chunkwise(*a, chunk_size=8)
    _, vjp = jax.vjp(fn, q, k, v, i, f)
    want = vjp(dh)
    got = mlstm_chunkwise_bwd_ref(q, k, v, i, f, dh, chunk_size=8)
    for name, a, b in zip("qkv", got[:3], want[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4, err_msg=f"d{name}")
    for name, a, b in zip("if", got[3:], want[3:]):
        scale = float(jnp.max(jnp.abs(b)))
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 2e-2, f"d{name} rel err {err}"


@pytest.mark.parametrize("igate_act", ["exp", "sigmoid"])
def test_pallas_bwd_kernel_matches_golden(igate_act):
    """Fused reverse-streaming Pallas backward (mlstm_pallas_bwd) vs the
    golden jnp form, interpret mode, multi-chunk state chain."""
    from xlstm_yolo_tpu.kernels.mlstm_pallas_bwd import mlstm_chunkwise_pallas_bwd

    r = np.random.default_rng(4)
    B, NH, S, DH, CS = 2, 2, 64, 8, 8
    q, k, v = (jnp.asarray(r.normal(size=(B, NH, S, DH)), jnp.float32)
               for _ in range(3))
    i = jnp.asarray(r.normal(size=(B, NH, S)), jnp.float32)
    f = jnp.asarray(r.normal(size=(B, NH, S)) + 2, jnp.float32)
    dh = jnp.asarray(r.normal(size=(B, NH, S, DH)), jnp.float32)
    want = mlstm_chunkwise_bwd_ref(q, k, v, i, f, dh, chunk_size=CS,
                                   igate_act=igate_act)
    got = mlstm_chunkwise_pallas_bwd(q, k, v, i, f, dh, chunk_size=CS,
                                     igate_act=igate_act, interpret=True,
                                     mxu_dtype="float32")
    for name, a, b in zip("qkvif", got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4, err_msg=f"d{name}")


def test_pallas_wrapper_grad_uses_fused_bwd():
    """jax.grad through mlstm_chunkwise_pallas routes square heads to the
    Pallas backward and still matches grads of the native form."""
    from xlstm_yolo_tpu.kernels.mlstm_pallas import mlstm_chunkwise_pallas

    r = np.random.default_rng(5)
    B, NH, S, DH, CS = 2, 2, 32, 8, 8
    q = jnp.asarray(r.normal(size=(B, NH, S, DH)), jnp.float32)
    k = q + 0.1 * jnp.asarray(r.normal(size=(B, NH, S, DH)), jnp.float32)
    v = jnp.asarray(r.normal(size=(B, NH, S, DH)), jnp.float32)
    i = jnp.asarray(r.normal(size=(B, NH, S)), jnp.float32)
    f = jnp.asarray(r.normal(size=(B, NH, S)) + 2, jnp.float32)

    gp = jax.grad(lambda q: jnp.sum(
        mlstm_chunkwise_pallas(q, k, v, i, f, chunk_size=CS, interpret=True,
                               mxu_dtype="float32") ** 2))(q)
    gn = jax.grad(lambda q: jnp.sum(
        mlstm_chunkwise(q, k, v, i, f, chunk_size=CS) ** 2))(q)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gn), rtol=1e-3, atol=1e-3)
