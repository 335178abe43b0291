"""sLSTM kernel + xLSTM stack tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.kernels import slstm as K


def _np_slstm_ref(wx, r, b):
    """Independent numpy reference of the sLSTM recurrence
    (math from reference src/vanilla/slstm.py:8-40)."""
    B, S, NH, _, DH = wx.shape
    y = np.zeros((B, NH, DH))
    c = np.zeros((B, NH, DH))
    n = np.zeros((B, NH, DH))
    m = np.zeros((B, NH, DH))
    outs = []
    logsig = lambda x: -np.log1p(np.exp(-x))
    for t in range(S):
        ry = np.einsum("bnd,ndge->bnge", y, r)
        raw = wx[:, t] + ry + b[None]
        iraw, fraw, zraw, oraw = raw[:, :, 0], raw[:, :, 1], raw[:, :, 2], raw[:, :, 3]
        if t == 0:
            mnew = iraw  # reference: first step (all n == 0) uses iraw
        else:
            mnew = np.maximum(iraw, logsig(fraw) + m)
        og = 1 / (1 + np.exp(-oraw))
        ig = np.exp(iraw - mnew)
        fg = np.exp(logsig(fraw) + m - mnew) if t > 0 else 0.0
        c = fg * c + ig * np.tanh(zraw)
        n = fg * n + ig
        y = og * c / n
        m = mnew
        outs.append(y.copy())
    return np.stack(outs, 1)


@pytest.mark.smoke
def test_slstm_scan_matches_numpy():
    rng = np.random.default_rng(0)
    B, S, NH, DH = 2, 16, 3, 8
    wx = rng.normal(size=(B, S, NH, 4, DH)).astype(np.float32)
    r = (rng.normal(size=(NH, DH, 4, DH)) * 0.2).astype(np.float32)
    b = rng.normal(size=(NH, 4, DH)).astype(np.float32)
    got = K.slstm_scan(jnp.asarray(wx), jnp.asarray(r), jnp.asarray(b))
    want = _np_slstm_ref(wx, r, b)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_slstm_state_carry():
    rng = np.random.default_rng(1)
    B, S, NH, DH = 1, 12, 2, 8
    wx = rng.normal(size=(B, S, NH, 4, DH)).astype(np.float32)
    r = (rng.normal(size=(NH, DH, 4, DH)) * 0.2).astype(np.float32)
    b = rng.normal(size=(NH, 4, DH)).astype(np.float32)
    full = K.slstm_scan(jnp.asarray(wx), jnp.asarray(r), jnp.asarray(b))
    y1, st = K.slstm_scan(jnp.asarray(wx[:, :6]), jnp.asarray(r), jnp.asarray(b), return_last_state=True)
    y2 = K.slstm_scan(jnp.asarray(wx[:, 6:]), jnp.asarray(r), jnp.asarray(b), initial_state=st)
    np.testing.assert_allclose(np.concatenate([y1, y2], 1), np.asarray(full), rtol=1e-4, atol=1e-4)


def test_slstm_step_matches_scan():
    rng = np.random.default_rng(2)
    B, S, NH, DH = 1, 5, 2, 4
    wx = rng.normal(size=(B, S, NH, 4, DH)).astype(np.float32)
    r = (rng.normal(size=(NH, DH, 4, DH)) * 0.2).astype(np.float32)
    b = rng.normal(size=(NH, 4, DH)).astype(np.float32)
    full = K.slstm_scan(jnp.asarray(wx), jnp.asarray(r), jnp.asarray(b))
    zeros = jnp.zeros((B, NH, DH))
    state = (zeros, zeros, zeros, jnp.full((B, NH, DH), K.NEG_INIT))
    ys = []
    for t in range(S):
        y, state = K.slstm_step(jnp.asarray(wx[:, t]), jnp.asarray(r), jnp.asarray(b), state)
        ys.append(y)
    np.testing.assert_allclose(np.stack(ys, 1), np.asarray(full), rtol=1e-4, atol=1e-4)


def test_powerlaw_bias():
    b = K.powerlaw_blockdependent_bias(2, 8, block_idx=0, num_blocks=4)
    assert b.shape == (2, 8)
    assert float(b[0, 0]) == pytest.approx(5.0)  # right_x at channel 0
    assert float(b[0, -1]) == pytest.approx(-7.0)  # 5 - 12


def test_xlstm_lm_model():
    from xlstm_yolo_tpu.nn.xlstm import xLSTMLMModel

    m = xLSTMLMModel(vocab_size=50, embedding_dim=32, num_blocks=2, slstm_at=(1,),
                     num_heads=4, chunk_size=8)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 50, (2, 16)))
    v = m.init(jax.random.PRNGKey(0), tokens)
    logits = jax.jit(m.apply)(v, tokens)
    assert logits.shape == (2, 16, 50)
    assert bool(jnp.isfinite(logits).all())

    # gradient flows through both block kinds
    def loss(p):
        lg = m.apply(p, tokens)
        return -jnp.mean(jax.nn.log_softmax(lg)[..., 0])

    g = jax.grad(loss)(v)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    assert sum(float(jnp.abs(x).sum()) for x in leaves) > 0


def test_xlstm_lm_learns():
    """Tiny LM overfits a repeating sequence."""
    import optax

    from xlstm_yolo_tpu.nn.xlstm import xLSTMLMModel

    m = xLSTMLMModel(vocab_size=10, embedding_dim=32, num_blocks=2, slstm_at=(1,),
                     num_heads=4, chunk_size=8)
    seq = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8] * 4])
    x, y = seq[:, :-1], seq[:, 1:]
    v = m.init(jax.random.PRNGKey(0), x)
    tx = optax.adam(1e-2)
    opt = tx.init(v)

    @jax.jit
    def step(v, opt):
        def loss(p):
            lg = m.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(lg, y).mean()

        l, g = jax.value_and_grad(loss)(v)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(v, u), opt, l

    l0 = None
    for i in range(60):
        v, opt, l = step(v, opt)
        if l0 is None:
            l0 = float(l)
    assert float(l) < l0 * 0.3, f"LM did not learn: {l0} -> {float(l)}"
