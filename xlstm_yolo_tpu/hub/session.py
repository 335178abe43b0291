"""Hub training session: metric upload queue + checkpoint upload with
retry/backoff and rate limiting (reference hub/session.py:19-392,
hub/utils.py:111-167).

Design deltas from the reference:
  * urllib instead of requests; JSON bodies; checkpoint upload streams the
    msgpack state file as a raw PUT.
  * the metric queue is drained by one daemon thread with exponential
    backoff (the reference fires a thread per request_queue call).
  * attaches to a Trainer through the standard callback registry
    (on_fit_epoch_end -> queue metrics, on_model_save -> upload ckpt),
    mirroring utils/callbacks/hub.py in the reference.
"""
from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request
from pathlib import Path
from queue import Empty, Queue

from ..utils import LOGGER

# HTTP statuses worth retrying (reference session.py:276-283)
RETRY_CODES = {408, 429, 500, 502, 503, 504}


def smart_request(method: str, url: str, *, data: dict | bytes | None = None,
                  headers: dict | None = None, retry: int = 3, timeout: float = 30.0,
                  thread: bool = False, verbose: bool = True):
    """urllib request with exponential backoff on retryable statuses
    (reference hub/utils.py:111 smart_request). Returns the parsed JSON body
    (plus ``_status``) or None after exhausting retries; with ``thread=True``
    fires and forgets on a daemon thread."""

    def _do():
        body = data
        hdrs = dict(headers or {})
        if isinstance(body, dict):
            body = json.dumps(body).encode()
            hdrs.setdefault("Content-Type", "application/json")
        for attempt in range(retry + 1):
            try:
                req = urllib.request.Request(url, data=body, headers=hdrs, method=method)
                with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
                    status = resp.getcode()
                    payload = resp.read()
                    out = json.loads(payload) if payload else {}
                    out["_status"] = status
                    return out
            except urllib.error.HTTPError as e:
                if e.code not in RETRY_CODES or attempt == retry:
                    if verbose:
                        LOGGER.warning(f"hub: {method} {url} -> HTTP {e.code} (giving up)")
                    return None
            except Exception as e:
                if attempt == retry:
                    if verbose:
                        LOGGER.warning(f"hub: {method} {url} failed: {e}")
                    return None
            time.sleep(2**attempt)  # 1, 2, 4, ... backoff (reference utils.py:141)
        return None

    if thread:
        threading.Thread(target=_do, daemon=True).start()
        return None
    return _do()


class HubTrainingSession:
    """Streams training progress to a registry endpoint.

    Rate limits follow the reference (session.py:60): metrics every 3s,
    checkpoints every 15min, heartbeats every 30s.
    """

    RATE_LIMITS = {"metrics": 3.0, "ckpt": 900.0, "heartbeat": 30.0}

    def __init__(self, base_url: str, model_id: str = "", api_key: str = ""):
        from .auth import Auth

        self.base_url = base_url.rstrip("/")
        self.model_id = model_id
        self.auth = Auth(api_key, base_url=base_url)
        self.metrics_queue: Queue = Queue()
        self._timers: dict[str, float] = {}
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._drain, daemon=True)
        self._worker.start()
        self.alive = True

    # -- lifecycle -----------------------------------------------------
    @classmethod
    def create_session(cls, identifier: str, args: dict | None = None):
        """'https://host/models/ID' | 'host::ID' -> session (reference
        session.py:80/_parse_identifier :147)."""
        if "::" in identifier:
            base, model_id = identifier.split("::", 1)
        elif "/models/" in identifier:
            base, model_id = identifier.split("/models/", 1)
        else:
            raise ValueError(f"cannot parse hub identifier {identifier!r}")
        s = cls(base, model_id)
        if args:
            s.create_model(args)
        return s

    def create_model(self, model_args: dict) -> None:
        """Register a new model entry (reference session.py:110)."""
        r = smart_request("POST", f"{self.base_url}/v1/models",
                          data={"id": self.model_id, "args": model_args},
                          headers=self.auth.get_auth_header(), retry=2, verbose=False)
        if r and r.get("id"):
            self.model_id = str(r["id"])

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)
        self.alive = False

    # -- uploads -------------------------------------------------------
    def upload_metrics(self, epoch: int, metrics: dict) -> None:
        """Queue one epoch's scalars; coalesced + rate-limited on the drain
        thread (reference session.py:311 + callbacks/hub.py queue)."""
        clean = {k: float(v) for k, v in metrics.items() if isinstance(v, (int, float))}
        self.metrics_queue.put({"epoch": int(epoch), "metrics": clean})

    def upload_model(self, epoch: int, ckpt_dir: str | Path, is_best: bool = False,
                     final: bool = False) -> None:
        """PUT the msgpack checkpoint payload, rate-limited unless final
        (reference session.py:315)."""
        now = time.monotonic()
        if not final and now - self._timers.get("ckpt", -1e9) < self.RATE_LIMITS["ckpt"]:
            return
        self._timers["ckpt"] = now
        state = Path(ckpt_dir) / "state.msgpack"
        if not state.exists():
            return
        smart_request(
            "PUT",
            f"{self.base_url}/v1/models/{self.model_id}/ckpt?epoch={epoch}&best={int(is_best)}&final={int(final)}",
            data=state.read_bytes(),
            headers={**self.auth.get_auth_header(), "Content-Type": "application/octet-stream"},
            retry=2, thread=not final, verbose=False,
        )

    def heartbeat(self) -> None:
        now = time.monotonic()
        if now - self._timers.get("heartbeat", -1e9) < self.RATE_LIMITS["heartbeat"]:
            return
        self._timers["heartbeat"] = now
        smart_request("POST", f"{self.base_url}/v1/agent/heartbeat",
                      data={"model": self.model_id}, headers=self.auth.get_auth_header(),
                      retry=0, thread=True, verbose=False)

    # -- drain thread ----------------------------------------------------
    def _drain(self):
        while not self._stop.is_set():
            batch = []
            try:
                batch.append(self.metrics_queue.get(timeout=0.5))
                while True:  # coalesce whatever is queued
                    batch.append(self.metrics_queue.get_nowait())
            except Empty:
                pass
            if not batch:
                continue
            wait = self.RATE_LIMITS["metrics"] - (time.monotonic() - self._timers.get("metrics", -1e9))
            if wait > 0:
                time.sleep(wait)
            self._timers["metrics"] = time.monotonic()
            smart_request("POST", f"{self.base_url}/v1/models/{self.model_id}/metrics",
                          data={"rows": batch}, headers=self.auth.get_auth_header(),
                          retry=2, verbose=False)

    # -- trainer glue ----------------------------------------------------
    def callbacks(self) -> dict:
        """Hook dict to merge into a Callbacks registry (the reference wires
        the same three events in utils/callbacks/hub.py)."""
        def on_fit_epoch_end(trainer):
            row = {**(trainer.metrics or {})}
            self.upload_metrics(trainer.epoch, row)
            self.heartbeat()

        def on_model_save(trainer):
            self.upload_model(trainer.epoch, trainer.save_dir / "last.ckpt",
                              is_best=trainer.best_fitness == getattr(trainer, "fitness", None))

        def on_train_end(trainer):
            self.upload_model(trainer.epoch, trainer.save_dir / "best.ckpt", is_best=True, final=True)
            self.close()

        return {"on_fit_epoch_end": on_fit_epoch_end, "on_model_save": on_model_save,
                "on_train_end": on_train_end}
