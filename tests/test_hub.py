"""Hub client against a local in-process HTTP server (no egress)."""
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from xlstm_yolo_tpu.hub import Auth, HubTrainingSession, smart_request


pytestmark = pytest.mark.smoke


class _Handler(BaseHTTPRequestHandler):
    store = {"metrics": [], "ckpts": [], "auth": 0, "fail_next": 0}

    def _reply(self, code=200, body=None):
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(json.dumps(body or {}).encode())

    def do_GET(self):
        if self.path.startswith("/v1/auth"):
            self.store["auth"] += 1
            ok = self.headers.get("x-api-key") == "k123"
            self._reply(200 if ok else 401)
        else:
            self._reply(404)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n) or b"{}")
        if self.store["fail_next"] > 0:
            self.store["fail_next"] -= 1
            self._reply(503)
            return
        if "/metrics" in self.path:
            self.store["metrics"].extend(body.get("rows", []))
            self._reply(200)
        elif self.path == "/v1/models":
            self._reply(200, {"id": "m42"})
        else:
            self._reply(200)

    def do_PUT(self):
        n = int(self.headers.get("Content-Length", 0))
        payload = self.rfile.read(n)
        self.store["ckpts"].append((self.path, len(payload)))
        self._reply(200)

    def log_message(self, *a):
        pass


@pytest.fixture()
def server():
    _Handler.store = {"metrics": [], "ckpts": [], "auth": 0, "fail_next": 0}
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", _Handler.store
    srv.shutdown()


def test_smart_request_retries_on_503(server):
    base, store = server
    store["fail_next"] = 2
    r = smart_request("POST", f"{base}/v1/models/m/metrics", data={"rows": [{"epoch": 0}]},
                      retry=3, verbose=False)
    assert r is not None and r["_status"] == 200
    assert store["metrics"] == [{"epoch": 0}]


def test_smart_request_gives_up(server):
    base, store = server
    store["fail_next"] = 99
    assert smart_request("POST", f"{base}/v1/models/m/metrics", data={}, retry=1,
                         verbose=False) is None


def test_auth(server, monkeypatch):
    base, store = server
    monkeypatch.delenv("HUB_API_KEY", raising=False)
    assert Auth("k123", base_url=base).authenticate()
    assert not Auth("wrong", base_url=base).authenticate()
    assert Auth("k123_modelsuffix", base_url=base).api_key == "k123"


def test_session_metrics_and_ckpt(server, tmp_path):
    base, store = server
    s = HubTrainingSession.create_session(f"{base}::orig", args={"task": "detect"})
    assert s.model_id == "m42"  # server-assigned
    s.RATE_LIMITS = {**s.RATE_LIMITS, "metrics": 0.0}
    s.upload_metrics(0, {"loss": 1.5, "names": "skipme"})
    s.upload_metrics(1, {"loss": 1.2})
    ck = tmp_path / "last.ckpt"
    ck.mkdir()
    (ck / "state.msgpack").write_bytes(b"\0" * 64)
    s.upload_model(1, ck, final=True)
    deadline = time.time() + 10
    while len(store["metrics"]) < 2 and time.time() < deadline:
        time.sleep(0.05)
    s.close()
    assert {m["epoch"] for m in store["metrics"]} == {0, 1}
    assert all("names" not in m["metrics"] for m in store["metrics"])  # scalars only
    assert store["ckpts"] and store["ckpts"][0][1] == 64
    # parse both identifier forms
    assert HubTrainingSession.create_session(f"{base}/models/abc").model_id == "abc"
    with pytest.raises(ValueError):
        HubTrainingSession.create_session("garbage")


def test_session_callback_dict(server, tmp_path):
    base, store = server
    s = HubTrainingSession(base, "m1")
    cbs = s.callbacks()
    assert set(cbs) == {"on_fit_epoch_end", "on_model_save", "on_train_end"}

    class T:  # minimal trainer stand-in
        epoch = 3
        metrics = {"loss": 0.5}
        best_fitness = 0.1
        save_dir = tmp_path

    (tmp_path / "best.ckpt").mkdir()
    (tmp_path / "best.ckpt" / "state.msgpack").write_bytes(b"\1" * 8)
    s.RATE_LIMITS = {**s.RATE_LIMITS, "metrics": 0.0}
    cbs["on_fit_epoch_end"](T())
    cbs["on_train_end"](T())
    deadline = time.time() + 10
    while not store["ckpts"] and time.time() < deadline:
        time.sleep(0.05)
    assert store["ckpts"]
    assert not s.alive  # closed after final upload
