"""Remote inference backend: HTTP model server + AutoBackend client.

The TPU-native analogue of the reference's Triton path
(/root/reference/utils/triton.py:1-93, nn/autobackend.py:54): serve_model
holds the jitted model; AutoBackend("http://...") round-trips batches over
npz. Localhost only — zero egress.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_remote_backend_matches_local():
    from xlstm_yolo_tpu.nn.autobackend import AutoBackend
    from xlstm_yolo_tpu.utils.remote import serve_model

    server = serve_model("yolov8n.yaml", imgsz=64)
    try:
        host, port = server.server_address
        url = f"http://{host}:{port}/infer"

        local = AutoBackend("yolov8n.yaml", imgsz=64)
        remote = AutoBackend(url, imgsz=64)
        assert remote.kind == "remote"
        # /meta round-trip
        assert remote.meta.get("nc") == 80
        assert remote.meta.get("task") == "detect"

        img = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
        want = local.forward(img)
        got = remote.forward(img)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    finally:
        server.shutdown()


def test_remote_backend_error_reporting():
    from xlstm_yolo_tpu.utils.remote import RemoteModel, serve_model

    server = serve_model("yolov8n.yaml", imgsz=64)
    try:
        host, port = server.server_address
        rm = RemoteModel(f"http://{host}:{port}")
        # malformed payload -> HTTP 500 with a JSON error, server stays up
        import urllib.error
        import urllib.request

        req = urllib.request.Request(rm.url, data=b"not-an-npz")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 500
        # still serving after the bad request
        img = np.zeros((1, 64, 64, 3), np.float32)
        assert rm(img).shape[0] == 1
    finally:
        server.shutdown()
