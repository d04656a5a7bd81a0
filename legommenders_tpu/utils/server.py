"""lego-server REST client — remote experiment tracking.

Parity: reference utils/server.py:103-263 — evaluations/experiments CRUD
against a lego-server instance: look up an evaluation by (command,
configuration), create experiments per seed, register the worker pid,
upload the purified log and final performance, and mark completion.
Auth token comes from the `.auth` dotfile (`lego_server` / `token` keys).

All calls degrade to no-ops with a warning when the server is unreachable
(the framework must train fine offline).
"""
import getpass
import json
import os
import socket
from typing import Any, Dict, Optional
from urllib import request as _request
from urllib.error import URLError

from legommenders_tpu.config.dotfiles import AuthInit
from legommenders_tpu.utils.logging import get_logger


class Server:
    def __init__(self, base_url: Optional[str] = None,
                 token: Optional[str] = None, timeout: float = 5.0):
        self.base_url = (base_url or AuthInit.get("lego_server") or "").rstrip("/")
        self.token = token or AuthInit.get("token")
        self.timeout = timeout
        self.log = get_logger("server")

    @property
    def active(self) -> bool:
        return bool(self.base_url)

    # ------------------------------------------------------------------
    def _call(self, method: str, path: str,
              body: Optional[Dict[str, Any]] = None):
        if not self.active:
            return None
        url = f"{self.base_url}{path}"
        data = json.dumps(body).encode() if body is not None else None
        req = _request.Request(url, data=data, method=method)
        req.add_header("Content-Type", "application/json")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with _request.urlopen(req, timeout=self.timeout) as resp:
                payload = resp.read().decode()
                return json.loads(payload) if payload else None
        except (URLError, OSError, ValueError) as e:
            self.log.warning(f"lego-server {method} {path} failed: {e}")
            return None

    # ------------------------------------------------------------------
    # evaluations / experiments API (reference utils/server.py:160-263)
    # ------------------------------------------------------------------
    def get_or_create_evaluation(self, command: str, configuration: dict):
        return self._call("POST", "/evaluations/", dict(
            command=command, configuration=json.dumps(configuration)))

    def create_experiment(self, evaluation_id: str, seed: int):
        return self._call("POST", "/experiments/", dict(
            evaluation=evaluation_id, seed=seed))

    def register_pid(self, experiment_id: str):
        return self._call("PUT", f"/experiments/{experiment_id}/register",
                          dict(pid=os.getpid(),
                               host=socket.gethostname(),
                               user=getpass.getuser()))

    def is_experiment_running(self, experiment_id: str) -> bool:
        info = self._call("GET", f"/experiments/{experiment_id}") or {}
        return bool(info.get("running"))

    def complete_experiment(self, experiment_id: str, log: str,
                            performance: Dict[str, float]):
        return self._call("PUT", f"/experiments/{experiment_id}/complete",
                          dict(log=log,
                               performance=json.dumps(performance)))

    def completed_seeds(self, command: str):
        info = self._call("GET", "/evaluations/",
                          dict(command=command)) or {}
        return set(info.get("completed_seeds") or [])
