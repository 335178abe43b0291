"""Kernel math parity vs the reference's OWN pure-torch implementations.

test_mlstm.py / test_xlstm.py verify our kernels against independently
re-derived numpy math; these tests close the loop by executing the actual
mounted reference code (pure-torch, no CUDA/Triton needed):

  * mlstm_parallel   vs xlstm/blocks/mlstm/backends.py:parallel_stabilized_simple
  * mlstm_recurrent  vs backends.py:recurrent_step_stabilized_simple (looped)
  * mlstm_chunkwise  vs backends.py:chunkwise_simple (incl. state carry)
  * slstm_scan       vs xlstm/blocks/slstm/src/vanilla/slstm.py:slstm_forward_pointwise

Both backends.py and vanilla/slstm.py import only torch, so they are loaded
standalone (no ultralytics package import). Skipped without the mount.
"""
import importlib.util
import pathlib

import numpy as np
import pytest

BACKENDS = "/root/reference/nn/modules/vision_lstm/xlstm/blocks/mlstm/backends.py"
VANILLA = "/root/reference/nn/modules/vision_lstm/xlstm/blocks/slstm/src/vanilla/slstm.py"


pytestmark = [pytest.mark.smoke, pytest.mark.liveref]


def _load(path, name):
    if not pathlib.Path(path).exists():
        pytest.skip("reference mount not present")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_backends():
    return _load(BACKENDS, "ref_mlstm_backends")


@pytest.fixture(scope="module")
def ref_vanilla():
    return _load(VANILLA, "ref_vanilla_slstm")


def _qkvif(B=2, NH=2, S=32, DH=16, seed=0):
    r = np.random.default_rng(seed)
    q, k, v = (r.normal(size=(B, NH, S, DH)).astype(np.float32) for _ in range(3))
    i = r.normal(size=(B, NH, S)).astype(np.float32)
    f = (r.normal(size=(B, NH, S)) + 2.0).astype(np.float32)
    return q, k, v, i, f


def test_mlstm_parallel_matches_reference(ref_backends):
    import torch

    import jax.numpy as jnp

    from xlstm_yolo_tpu.kernels.mlstm_native import mlstm_parallel

    q, k, v, i, f = _qkvif()
    with torch.no_grad():
        href = ref_backends.parallel_stabilized_simple(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            torch.from_numpy(i)[..., None], torch.from_numpy(f)[..., None],
        ).numpy()
    ours = np.asarray(mlstm_parallel(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                     jnp.asarray(i), jnp.asarray(f)))
    np.testing.assert_allclose(ours, href, rtol=2e-5, atol=2e-5)


def test_mlstm_recurrent_matches_reference_step_loop(ref_backends):
    import torch

    import jax.numpy as jnp

    from xlstm_yolo_tpu.kernels.mlstm_native import mlstm_recurrent

    B, NH, S, DH = 2, 2, 16, 8
    q, k, v, i, f = _qkvif(B, NH, S, DH, seed=1)
    c = torch.zeros(B, NH, DH, DH)
    n = torch.zeros(B, NH, DH, 1)
    m = torch.zeros(B, NH, 1, 1)
    hs = []
    with torch.no_grad():
        for t in range(S):
            h, (c, n, m) = ref_backends.recurrent_step_stabilized_simple(
                c, n, m,
                torch.from_numpy(q[:, :, t:t + 1].copy()),
                torch.from_numpy(k[:, :, t:t + 1].copy()),
                torch.from_numpy(v[:, :, t:t + 1].copy()),
                torch.from_numpy(i[:, :, t, None, None].copy()),
                torch.from_numpy(f[:, :, t, None, None].copy()),
            )
            hs.append(h.reshape(B, NH, DH).numpy())
    href = np.stack(hs, axis=2)  # (B, NH, S, DH)

    ours = np.asarray(mlstm_recurrent(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                      jnp.asarray(i), jnp.asarray(f)))
    np.testing.assert_allclose(ours, href, rtol=2e-5, atol=2e-5)


def test_mlstm_chunkwise_matches_reference(ref_backends):
    import torch

    import jax.numpy as jnp

    from xlstm_yolo_tpu.kernels.mlstm_native import mlstm_chunkwise

    q, k, v, i, f = _qkvif(seed=2)
    with torch.no_grad():
        href, (rc, rn, rm) = ref_backends.chunkwise_simple(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            torch.from_numpy(i), torch.from_numpy(f),
            chunk_size=8, return_last_state=True,
        )
    ours, (oc, on, om) = mlstm_chunkwise(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(i),
        jnp.asarray(f), chunk_size=8, return_last_state=True,
    )
    np.testing.assert_allclose(np.asarray(ours), href.numpy(), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(oc), rc.numpy().reshape(np.asarray(oc).shape),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(on), rn.numpy().reshape(np.asarray(on).shape),
                               rtol=2e-5, atol=2e-5)


def test_slstm_scan_matches_reference_pointwise_loop(ref_vanilla):
    import torch

    import jax.numpy as jnp

    from xlstm_yolo_tpu.kernels.slstm import slstm_scan

    r = np.random.default_rng(3)
    B, S, NH, DH = 2, 12, 2, 8
    wx = r.normal(size=(B, S, NH, 4, DH)).astype(np.float32)
    R = (r.normal(size=(NH, DH, 4, DH)) * 0.1).astype(np.float32)
    bias = (r.normal(size=(NH, 4, DH)) * 0.1).astype(np.float32)

    # reference loop, per head: states (4=y,c,n,m, B, DH); gate-major (B, 4*DH)
    href = np.zeros((B, S, NH, DH), np.float32)
    with torch.no_grad():
        for h in range(NH):
            states = torch.zeros(4, B, DH)
            Rh = torch.from_numpy(R[h].reshape(DH, 4 * DH))
            bh = torch.from_numpy(bias[h].reshape(1, 4 * DH))
            for t in range(S):
                Wx = torch.from_numpy(wx[:, t, h].reshape(B, 4 * DH).copy())
                Ry = states[0] @ Rh
                states, _gates = ref_vanilla.slstm_forward_pointwise(
                    Wx, Ry, bh, states, {})
                href[:, t, h] = states[0].numpy()

    ours = np.asarray(slstm_scan(jnp.asarray(wx), jnp.asarray(R), jnp.asarray(bias)))
    np.testing.assert_allclose(ours, href, rtol=2e-5, atol=2e-5)
