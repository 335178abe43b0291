"""Mesh / sharding tests on the 8-device virtual CPU platform."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.parallel import mesh as M


pytestmark = pytest.mark.slow


def test_mesh_shapes():
    m = M.build_mesh(dp=4, tp=2, sp=1)
    assert m.shape == {"dp": 4, "tp": 2, "sp": 1, "pp": 1, "ep": 1}
    m = M.build_mesh()  # all dp
    assert m.shape["dp"] == 8
    m = M.build_mesh(dp=2, tp=2, pp=2, ep=1)
    assert m.shape["pp"] == 2 and m.shape["ep"] == 1


def test_shard_batch_and_params():
    mesh = M.build_mesh(dp=8)
    batch = {"img": np.zeros((8, 16, 16, 3), np.float32)}
    db = M.shard_batch(mesh, batch)
    assert db["img"].sharding.spec == jax.sharding.PartitionSpec("dp")
    params = {"w": jnp.zeros((256, 512)), "b": jnp.zeros((4,))}
    sp = M.shard_params(mesh, params)
    # tp=1 -> all replicated
    assert sp["w"].sharding.spec == jax.sharding.PartitionSpec()


def test_dp_training_matches_single_device():
    """A dp=8 jitted loss must equal the single-device loss on the same batch."""
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    m = TaskModel("yolov8n.yaml", nc=3)
    v = m.init(0, imgsz=64)
    rng = np.random.default_rng(0)
    batch = {
        "img": np.asarray(rng.random((8, 64, 64, 3)), np.float32),
        "cls_boxes": np.tile(np.asarray([[1.0, 8, 8, 40, 40]], np.float32), (8, 4, 1)),
        "mask": np.ones((8, 4), bool),
    }
    (single, _), _ = jax.jit(lambda v, b: m.loss(v, b))(v, jax.tree.map(jnp.asarray, batch))

    mesh = M.build_mesh(dp=8)
    db = M.shard_batch(mesh, batch)
    vp = {"params": M.shard_params(mesh, v["params"]),
          "batch_stats": M.shard_params(mesh, v["batch_stats"])}
    (sharded, _), _ = jax.jit(lambda v, b: m.loss(v, b))(vp, db)
    np.testing.assert_allclose(float(single), float(sharded), rtol=1e-4)


def test_tp_sp_multistep_training_matches_single_device():
    """Convergence under sharding: N SGD steps with params tp=2-sharded and
    the batch dp=2/sp-sharded must produce the same loss trajectory as the
    unsharded run (not just a single forward) — the round-1 gap where
    tp/sp only had forward-equivalence checks."""
    import optax

    from xlstm_yolo_tpu.nn.tasks import TaskModel

    # a thinned 2-stage ViL+conv graph: exercises the exact same tp/sp
    # sharding rules (ViL proj/gate params + conv + Detect) as the flagship
    # but compiles ~3x faster on this 1-core host (round-5 ask: keep this
    # file under 5 min; vil_yolon here cost 204 s alone)
    cfg = {
        "nc": 3,
        "backbone": [
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "ViLBlockPairBlock", [64, 64, {"qkv_block_size": 32, "chunk_size": 64}]],
            [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "ViLBlockPairBlock", [128, 128, {"qkv_block_size": 32, "chunk_size": 64}]],
        ],
        "head": [
            [[2, 4], 1, "Detect", ["nc"]],
        ],
    }
    m = TaskModel(cfg, nc=3)
    v = m.init(0, imgsz=64)
    rng = np.random.default_rng(0)
    batch = {
        "img": np.asarray(rng.random((4, 64, 64, 3)), np.float32),
        "cls_boxes": np.tile(np.asarray([[1.0, 8, 8, 40, 40]], np.float32), (4, 4, 1)),
        "mask": np.ones((4, 4), bool),
    }
    tx = optax.sgd(0.01, momentum=0.9)

    def run(params, stats, db, nsteps=3):
        opt = tx.init(params)
        losses = []

        @jax.jit
        def step(params, opt, b):
            def loss_fn(p):
                (total, _aux), _upd = m.loss({"params": p, "batch_stats": stats}, b)
                return total

            total, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), opt, total

        for _ in range(nsteps):
            params, opt, total = step(params, opt, db)
            losses.append(float(total))
        return losses

    ref = run(v["params"], v["batch_stats"], jax.tree.map(jnp.asarray, batch))

    mesh = M.build_mesh(dp=2, tp=2, sp=2)
    rules = M.param_sharding_rules(mesh, v["params"])
    vp = jax.device_put(v["params"], rules)
    stats_sh = M.shard_params(mesh, v["batch_stats"])
    db = M.shard_batch(mesh, batch)
    with mesh:
        got = run(vp, stats_sh, db)

    # fp32 reduction-order differences (XLA collectives vs local sums)
    # compound through SGD momentum + TAL re-assignment across steps:
    # measured 5.5e-4 relative after 3 steps, trajectory identical
    np.testing.assert_allclose(got, ref, rtol=2e-3)


def test_sequence_parallel_mlstm():
    """sp-sharded chunkwise mLSTM must match the single-shard result."""
    from xlstm_yolo_tpu.kernels.mlstm_native import mlstm_chunkwise
    from xlstm_yolo_tpu.kernels.mlstm_sp import mlstm_chunkwise_sp

    mesh = M.build_mesh(dp=1, tp=1, sp=8)
    rng = np.random.default_rng(0)
    B, NH, S, DH = 2, 4, 8 * 32, 16
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    q, k, v = mk(B, NH, S, DH), mk(B, NH, S, DH), mk(B, NH, S, DH)
    i, f = mk(B, NH, S), mk(B, NH, S) + 2.0

    want = mlstm_chunkwise(q, k, v, i, f, chunk_size=16)
    got = jax.jit(
        lambda *a: mlstm_chunkwise_sp(*a, mesh=mesh, axis="sp", chunk_size=16)
    )(q, k, v, i, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)


@pytest.mark.skipif(not os.environ.get("RUN_DRYRUN"),
                    reason="duplicates the driver's own __graft_entry__ "
                    "dryrun gate (~17 min on the 1-core host); RUN_DRYRUN=1 "
                    "to include it here")
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_tensor_parallel_vil_matches_replicated():
    """Megatron-style TP rules (mesh.py:param_sharding_rules): a ViL block
    stack run with tp=2-sharded params (proj_up column / heads / proj_down
    row) must match the fully replicated forward."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.nn.vil import ViLBlockPair

    D = 64
    blk = ViLBlockPair(dim=D, qkv_block_size=16, seqlens=(4, 4), chunk_size=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, D), jnp.float32)
    v = blk.init(jax.random.PRNGKey(1), x)
    y_ref = np.asarray(jax.jit(blk.apply)(v, x))

    mesh = M.build_mesh(dp=2, tp=2, sp=2)
    rules = M.param_sharding_rules(mesh, v["params"])
    # the rules must actually engage: at least proj_up col + proj_down row +
    # one headwise weight sharded over tp
    specs = {jax.tree_util.keystr(p): s.spec
             for p, s in jax.tree_util.tree_flatten_with_path(rules)[0]}
    assert any("proj_up" in k and s == ("tp",) for k, s in
               ((k, tuple(x for x in s if x)) for k, s in specs.items())), specs
    assert any("proj_down" in k and "kernel" in k and s[0] == "tp"
               for k, s in specs.items() if len(s) > 0)
    assert any("q_proj" in k and s[0] == "tp" for k, s in specs.items() if len(s) > 0)

    vp = {"params": jax.device_put(v["params"], rules)}
    xs = jax.device_put(x, M.batch_sharding(mesh))
    with mesh:
        y_tp = np.asarray(jax.jit(blk.apply)(vp, xs))
    np.testing.assert_allclose(y_tp, y_ref, rtol=2e-5, atol=2e-5)


def test_distributed_helpers_single_host():
    """ensure_initialized is an idempotent no-op single-host; helpers report
    rank 0 of 1 and the loader shard wiring matches."""
    from xlstm_yolo_tpu.parallel import distributed as D

    assert D.ensure_initialized() == (0, 1)
    assert D.ensure_initialized() == (0, 1)  # idempotent
    assert D.local_shard() == (0, 1)
    assert D.is_main_process()


@pytest.mark.smoke
def test_loader_process_sharding():
    """Loader with shard_index/num_shards partitions the index space without
    overlap — the DistributedSampler equivalent."""
    import numpy as np

    from xlstm_yolo_tpu.data.dataset import Loader

    class DS:
        task = "detect"
        augment = False

        def __len__(self):
            return 16

        def get_sample(self, i, rng):
            return i

        def collate_native(self, idxs):
            return None

        def collate(self, samples, idxs=None):
            return list(samples)

    seen = []
    for si in range(2):
        ld = Loader(DS(), batch_size=4, shuffle=False, num_shards=2, shard_index=si)
        assert len(ld) == 2
        for b in ld:
            seen.extend(b)
    assert sorted(seen) == list(range(16))
