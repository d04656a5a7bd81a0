"""lego-server client contract, exercised against a stub HTTP server.

The stub implements the reference backend's wire contract (reference
utils/server.py:31-263, worker.py:93-157): envelope responses with
`identifier == "OK"`, `Authentication` header, signature-keyed evaluations,
session-keyed experiments, paginated GET /evaluations/.
"""
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from legommenders_tpu.utils.server import (
    BaseResp, EvaluationBody, ExperimentBody, Server,
)

PAGE_SIZE = 2


class _State:
    def __init__(self):
        self.evaluations = {}   # signature -> {command, configuration, experiments}
        self.experiments = {}   # session -> dict
        self.next_session = 100
        self.auth_seen = []


class _Handler(BaseHTTPRequestHandler):
    state: _State = None

    def log_message(self, *a):  # silence
        pass

    def _send(self, body, identifier="OK", msg=None):
        payload = json.dumps(
            {"identifier": identifier, "msg": msg, "body": body}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _json_body(self):
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n)) if n else {}

    def do_POST(self):
        st = self.state
        st.auth_seen.append(self.headers.get("Authentication"))
        path = urlparse(self.path).path
        data = self._json_body()
        if path == "/evaluations/":
            sig = data["signature"]
            st.evaluations.setdefault(sig, {
                "signature": sig, "command": data["command"],
                "configuration": data["configuration"], "experiments": []})
            return self._send(st.evaluations[sig])
        if path == "/experiments/":
            sig, seed = data["signature"], data["seed"]
            for exp in st.evaluations[sig]["experiments"]:
                if exp["seed"] == seed:
                    return self._send(exp["session"])
            session = str(st.next_session)
            st.next_session += 1
            exp = {"signature": sig, "seed": seed, "session": session,
                   "is_completed": False, "pid": None}
            st.evaluations[sig]["experiments"].append(exp)
            st.experiments[session] = exp
            return self._send(session)
        if path.startswith("/experiments/") and path.endswith("/register"):
            session = path.split("/")[2]
            st.experiments[session]["pid"] = data["pid"]
            return self._send(None)
        return self._send(None, identifier="NOT_FOUND", msg=path)

    def do_GET(self):
        st = self.state
        st.auth_seen.append(self.headers.get("Authentication"))
        parsed = urlparse(self.path)
        query = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        if parsed.path == "/evaluations/":
            evals = list(st.evaluations.values())
            pages = max(1, -(-len(evals) // PAGE_SIZE))
            page = int(query.get("page", 1))
            chunk = evals[(page - 1) * PAGE_SIZE: page * PAGE_SIZE]
            return self._send({"total_page": pages, "evaluations": chunk})
        if parsed.path == "/experiments/":
            exp = st.experiments.get(query.get("session"))
            if exp is None:
                return self._send(None, identifier="NOT_FOUND")
            return self._send(exp)
        return self._send(None, identifier="NOT_FOUND", msg=parsed.path)

    def do_PUT(self):
        st = self.state
        data = self._json_body()
        if urlparse(self.path).path == "/experiments/":
            exp = st.experiments[data["session"]]
            exp.update(is_completed=True, log=data["log"],
                       performance=data["performance"])
            return self._send(None)
        return self._send(None, identifier="NOT_FOUND")


@pytest.fixture()
def stub():
    state = _State()
    handler = type("H", (_Handler,), {"state": state})
    httpd = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    server = Server(uri=f"http://127.0.0.1:{httpd.server_port}",
                    auth="tok-123", timeout=5.0)
    yield server, state
    httpd.shutdown()


def test_full_experiment_lifecycle(stub):
    server, state = stub
    cmd = "python trainer.py --data mind --model naml"
    resp = server.create_or_get_evaluation("sig-A", cmd, '{"lr": 0.001}')
    assert resp.ok and EvaluationBody(resp.body).command == cmd

    reply = server.create_or_get_experiment("sig-A", 2023)
    assert reply.ok
    session = reply.body
    # idempotent: same (signature, seed) returns the same session
    assert server.create_or_get_experiment("sig-A", 2023).body == session

    assert server.register_experiment(session).ok
    info = ExperimentBody(server.get_experiment_info(session).body)
    assert info.pid == server.pid and not info.is_completed

    assert server.complete_experiment(
        session, "log text", json.dumps({"GAUC": 0.68})).ok
    info = ExperimentBody(server.get_experiment_info(session).body)
    assert info.is_completed
    assert json.loads(info.performance) == {"GAUC": 0.68}

    # auth header was sent on every call
    assert set(state.auth_seen) == {"tok-123"}


def test_completed_seeds_dedup_with_pagination(stub):
    server, _ = stub
    # 3 evaluations -> 2 pages at PAGE_SIZE=2, exercising pagination
    for i in range(3):
        cmd = f"python trainer.py --model m{i}"
        server.create_or_get_evaluation(f"sig-{i}", cmd, "{}")
        for seed in (2023, 2024):
            session = server.create_or_get_experiment(f"sig-{i}", seed).body
            if seed == 2023:
                server.complete_experiment(session, "", "{}")
    table = server.completed_seeds_by_command()
    assert table == {f"python trainer.py --model m{i}": [2023]
                     for i in range(3)}


def test_inactive_and_unreachable_degrade_gracefully():
    inactive = Server()
    assert not inactive.active
    assert not inactive.create_or_get_evaluation("s", "c", "{}").ok

    dead = Server(uri="http://127.0.0.1:1", auth="x", timeout=0.5)
    resp = dead.create_or_get_experiment("s", 1)
    assert isinstance(resp, BaseResp) and not resp.ok and resp.msg
