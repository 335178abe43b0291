"""Model graph + loss integration tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.nn.tasks import TaskModel
from xlstm_yolo_tpu.utils import tal


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def v8n():
    m = TaskModel("yolov8n.yaml")
    v = m.init(0, imgsz=64)
    return m, v


def test_build_yolov8n(v8n):
    m, v = v8n
    assert m.strides == (8, 16, 32)
    assert m.nc == 80
    # parity fingerprint vs the torch reference (3,157,200 incl. its DFL conv)
    assert m.num_params(v) == 3_157_200 - 16


def test_forward_shapes(v8n):
    m, v = v8n
    x = jnp.zeros((2, 64, 64, 3))
    out = jax.jit(lambda v, x: m.raw_forward(v, x))(v, x)
    # per-scale (box, cls) stream pairs (round 5: the head no longer
    # concatenates — see nn/heads.py split_maps)
    assert [(b.shape, c.shape) for b, c in out] == [
        ((2, 8, 8, 64), (2, 8, 8, 80)),
        ((2, 4, 4, 64), (2, 4, 4, 80)),
        ((2, 2, 2, 64), (2, 2, 2, 80)),
    ]
    pred = jax.jit(m.predictions)(v, x)
    assert pred.shape == (2, 84, 84)
    assert bool(jnp.isfinite(pred).all())


def test_loss_and_grad(v8n):
    m, v = v8n
    batch = {
        "img": jnp.ones((2, 64, 64, 3)) * 0.5,
        "cls_boxes": jnp.tile(jnp.asarray([[1.0, 8.0, 8.0, 48.0, 48.0]]), (2, 4, 1)).reshape(2, 4, 5),
        "mask": jnp.ones((2, 4), bool).at[:, 2:].set(False),
    }

    @jax.jit
    def loss_and_grad(params, bs):
        def f(p):
            (tot, aux), upd = m.loss({"params": p, "batch_stats": bs}, batch)
            return tot, (aux, upd)

        (tot, (aux, upd)), g = jax.value_and_grad(f, has_aux=True)(params)
        return tot, aux, g

    tot, aux, g = loss_and_grad(v["params"], v["batch_stats"])
    assert bool(jnp.isfinite(tot))
    assert all(bool(jnp.isfinite(x)) for x in aux.values())
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))


def test_tal_assigns_overlapping_anchor():
    """A GT box containing high-score anchors must produce foreground matches."""
    nc, n_anchors = 4, 64
    anc = jnp.stack(
        jnp.meshgrid(jnp.arange(8.0) + 0.5, jnp.arange(8.0) + 0.5, indexing="xy"), -1
    ).reshape(-1, 2)
    # predicted boxes exactly on a grid cell around each anchor
    pd_bboxes = jnp.concatenate([anc - 1.5, anc + 1.5], axis=-1)[None]
    pd_scores = jnp.full((1, n_anchors, nc), 0.5)
    gt = jnp.asarray([[[1.0, 1.0, 5.0, 5.0]]])  # covers anchors in [1,5]^2
    labels = jnp.asarray([[[2]]], jnp.int32)
    mask = jnp.ones((1, 1, 1))
    tl, tb, ts, fg, tgi = tal.assign(pd_scores, pd_bboxes, anc, labels, gt, mask, num_classes=nc)
    assert int(fg.sum()) > 0
    picked = np.asarray(tl)[np.asarray(fg)]
    assert (picked == 2).all()
    # scores concentrated on class 2
    s = np.asarray(ts)[np.asarray(fg)]
    assert (s.argmax(-1) == 2).all()


def test_tal_respects_mask():
    """Padded (masked-out) GT slots must never be assigned."""
    nc = 2
    anc = jnp.asarray([[2.0, 2.0], [10.0, 10.0]])
    pd_bboxes = jnp.concatenate([anc - 2, anc + 2], -1)[None]
    pd_scores = jnp.full((1, 2, nc), 0.9)
    gt = jnp.asarray([[[0.0, 0.0, 4.0, 4.0], [8.0, 8.0, 12.0, 12.0]]])
    labels = jnp.zeros((1, 2, 1), jnp.int32)
    mask = jnp.asarray([[[1.0], [0.0]]])  # second GT is padding
    _, _, _, fg, _ = tal.assign(pd_scores, pd_bboxes, anc, labels, gt, mask, num_classes=nc)
    assert bool(fg[0, 0]) and not bool(fg[0, 1])


def test_nc_override():
    m = TaskModel("yolov8n.yaml", nc=7)
    assert m.nc == 7
    v = m.init(0, imgsz=64)
    pred = jax.jit(m.predictions)(v, jnp.zeros((1, 64, 64, 3)))
    assert pred.shape[-1] == 4 + 7


def test_v10_e2e_head():
    """v10Detect: one2one+one2many training, NMS-free inference."""
    from xlstm_yolo_tpu.nn.heads import v10_postprocess

    m = TaskModel("yolov10n.yaml", nc=3)
    assert m.e2e
    v = m.init(0, imgsz=64)
    x = jnp.ones((1, 64, 64, 3)) * 0.4
    cands = jax.jit(m.predictions)(v, x)
    dets = v10_postprocess(cands, max_det=30)
    assert dets.shape == (1, 30, 6)
    batch = {"img": x, "cls_boxes": jnp.asarray([[[0.0, 8, 8, 40, 40]]]),
             "mask": jnp.ones((1, 1), bool)}
    (tot, aux), _ = jax.jit(lambda v, b: m.loss(v, b))(v, batch)
    assert bool(jnp.isfinite(tot))


@pytest.mark.parametrize("name,params", [
    ("yolo11n.yaml", None), ("yolov5n.yaml", 2_654_800), ("yolov3.yaml", None),
    ("yolov9.yaml", None), ("yolo12n.yaml", None),
])
def test_model_zoo_builds(name, params):
    m = TaskModel(name)
    assert m.strides == (8, 16, 32)
    v = m.init(0, imgsz=64)
    if params:
        assert m.num_params(v) == params
    pred = jax.jit(m.predictions)(v, jnp.zeros((1, 64, 64, 3)))
    assert pred.shape == (1, 84, 84) and bool(jnp.isfinite(pred).all())


def test_extended_block_zoo():
    """The remaining reference block.py classes (SURVEY 2.3): C1/C2/C2fPSA/
    SPP/SPPELAN/ELAN1/ResNetLayer/GhostBottleneck/C3Ghost/C3x/BottleneckCSP/
    Conv2/LightConv/RepVGGDW all build + forward inside a graph."""
    import jax
    import jax.numpy as jnp
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    cfg = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Conv2", [16, 3, 2]],
            [-1, 1, "LightConv", [16]],
            [-1, 1, "C1", [16]],
            [-1, 1, "C2", [16]],
            [-1, 1, "C2fPSA", [16]],
            [-1, 1, "RepVGGDW", [16]],
            [-1, 1, "GhostBottleneck", [16]],
            [-1, 1, "C3Ghost", [16]],
            [-1, 1, "C3x", [16]],
            [-1, 1, "BottleneckCSP", [16]],
            [-1, 1, "SPP", [16]],
            [-1, 1, "SPPELAN", [16, 8]],
            [-1, 1, "ELAN1", [16, 16, 8]],
            [-1, 1, "Conv", [16, 3, 2]],  # /4
            [-1, 1, "Conv", [32, 3, 2]],  # /8
            [-1, 1, "Conv", [32, 3, 2]],  # /16
            [-1, 1, "Conv", [32, 3, 2]],  # /32
        ],
        "head": [[[14, 15, 16], 1, "Detect", [2]]],
    }
    m = TaskModel(cfg)
    assert m.strides == (8, 16, 32)
    v = m.init(0, imgsz=64)
    out = jax.jit(m.predictions)(v, jnp.zeros((1, 64, 64, 3)))
    assert out.shape[-1] == 6 and bool(jnp.isfinite(out).all())


def test_resnet_layer_and_cb_fuse():
    import jax
    import jax.numpy as jnp
    from xlstm_yolo_tpu.nn.modules import CBFuse, CBLinear, ResNetLayer

    x = jnp.ones((1, 32, 32, 8))
    stem = ResNetLayer(16, 1, True)
    v = stem.init(jax.random.PRNGKey(0), x)
    y = stem.apply(v, x)
    assert y.shape == (1, 8, 8, 16)  # 7x7/2 + maxpool/2
    stage = ResNetLayer(8, 2, False, n=2)
    v = stage.init(jax.random.PRNGKey(0), y)
    z = stage.apply(v, y)
    assert z.shape == (1, 4, 4, 32)  # stride 2, 4x expansion

    lin = CBLinear((4, 8))
    v = lin.init(jax.random.PRNGKey(0), x)
    parts = lin.apply(v, x)
    assert [p.shape[-1] for p in parts] == [4, 8]
    fuse = CBFuse(idx=(0,))
    tgt = jnp.ones((1, 16, 16, 4))
    out = fuse.apply({}, [parts, tgt])
    assert out.shape == tgt.shape


def test_cblinear_cbfuse_in_graph():
    """YOLOv9-style dual-branch routing through the graph compiler."""
    import jax
    import jax.numpy as jnp
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    cfg = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],   # 0 /2
            [-1, 1, "Conv", [16, 3, 2]],   # 1 /4
            [-1, 1, "CBLinear", [[8, 8]]],  # 2 (list output)
            [1, 1, "Conv", [8, 3, 2]],      # 3 /8
            [[2, -1], 1, "CBFuse", [[0]]],  # 4 fuse branch 0 into /8
            [-1, 1, "Conv", [16, 3, 2]],   # 5 /16
            [-1, 1, "Conv", [16, 3, 2]],   # 6 /32
        ],
        "head": [[[4, 5, 6], 1, "Detect", [2]]],
    }
    m = TaskModel(cfg)
    v = m.init(0, imgsz=64)
    out = jax.jit(m.predictions)(v, jnp.zeros((1, 64, 64, 3)))
    assert bool(jnp.isfinite(out).all())


def test_model_facade_load_reset_embed(tmp_path):
    """Model.load / reset_weights / embed / benchmark+tune existence
    (reference engine/model.py API surface)."""
    import numpy as np

    from xlstm_yolo_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    # save -> reset -> load round-trip restores weights
    ck = tmp_path / "w.ckpt"
    m.save(str(ck))
    import jax

    before = jax.tree.leaves(m.variables["params"])[0]
    m.reset_weights()
    m.load(str(ck))
    after = jax.tree.leaves(m.variables["params"])[0]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))

    # embed returns one feature vector per image
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3)).astype(np.uint8)
    emb = m.embed(img, imgsz=64)
    assert len(emb) == 1 and emb[0].ndim == 1 and emb[0].size > 0

    assert callable(m.benchmark) and callable(m.tune)


def test_extended_model_zoo_builds():
    """p2/p6/ghost/v3-tiny/v9{t,s,e} variants: build, stride-probe, forward;
    param counts match the reference summaries (e.g. v9e 58.1M, v8n-p6 4.98M)."""
    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.nn.tasks import TaskModel

    expect = {
        "yolov8-p2.yaml": ((4, 8, 16, 32), 3_354_128),
        "yolov8-p6.yaml": ((8, 16, 32, 64), 4_984_336),
        "yolov8-ghost.yaml": ((8, 16, 32), 1_865_300),
        "yolov3-tiny.yaml": ((16, 32), 12_173_232),
        "yolov9t.yaml": ((8, 16, 32), 2_128_704),
        "yolov9s.yaml": ((8, 16, 32), 7_318_352),
        "yolov9e.yaml": ((8, 16, 32), 58_206_576),
    }
    for y, (strides, n_params) in expect.items():
        m = TaskModel(y, nc=80)
        assert m.strides == strides, (y, m.strides)
        v = m.init(0, imgsz=128)
        n = sum(int(x.size) for x in jax.tree.leaves(v["params"]))
        assert n == n_params, (y, n)
        out = jax.jit(m.predictions)(v, jnp.zeros((1, 128, 128, 3)))
        assert out.shape[-1] == 84


def test_more_zoo_variants_build():
    """v3-spp, v5-p6, seg/pose p6, v9c-seg, worldv2, cls-resnet50 all parse,
    stride-probe and init (task dispatch per head)."""
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    expect = {
        "yolov3-spp.yaml": ("detect", (8, 16, 32)),
        "yolov5-p6.yaml": ("detect", (8, 16, 32, 64)),
        "yolov8-seg-p6.yaml": ("segment", (8, 16, 32, 64)),
        "yolov8-pose-p6.yaml": ("pose", (8, 16, 32, 64)),
        "yolov9c-seg.yaml": ("segment", (8, 16, 32)),
        "yolov8-worldv2.yaml": ("world", (8, 16, 32)),
        "yolov8-cls-resnet50.yaml": ("classify", ()),
    }
    for y, (task, strides) in expect.items():
        m = TaskModel(y)
        assert m.task == task, (y, m.task)
        assert m.strides == strides, (y, m.strides)
        m.init(0, imgsz=64 if task in ("classify",) else 128)
