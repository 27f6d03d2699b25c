"""Batching inference server round trip (tools/serve.py).

Starts the real HTTP server on the tiny occupancy model, posts npz
requests (including two concurrent ones so the coalescing path packs a
batch), and checks predictions, health, and input validation.
"""

import http.client
import io
import threading

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "_emp_serve",
        os.path.join(os.path.dirname(__file__), "..", "tools", "serve.py"),
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    srv, worker = serve.make_server(
        "tiny_occ_run", port=0, batch_size=2, coalesce_ms=50.0
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, worker, serve
    srv.shutdown()


def _post(port, body, path="/predict"):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    conn.request("POST", path, body=body,
                 headers={"Content-Type": "application/x-npz"})
    r = conn.getresponse()
    return r.status, r.read()


def _request_bytes(serve, n=1, seed=0):
    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )

    b = synthetic_batch(n, point_budget=512, seed=seed, as_jax=False)
    arrs = serve.batch_to_arrays(b)
    buf = io.BytesIO()
    np.savez(buf, **arrs)
    return buf.getvalue()


def test_predict_and_health(server):
    srv, worker, serve = server
    port = srv.server_address[1]

    # two concurrent single-sample requests -> the worker may pack them
    results = {}

    def call(i):
        results[i] = _post(port, _request_bytes(serve, 1, seed=i))

    ts = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join(timeout=600) for t in ts]

    for i in (0, 1):
        status, body = results[i]
        assert status == 200, body[:200]
        pred = np.load(io.BytesIO(body))["pred"]
        assert pred.shape == (1, 99, 99, 16) and pred.dtype == np.int8
        assert set(np.unique(pred)) <= set(range(5))
    assert worker.n_requests >= 2

    # a full-batch request in one shot
    status, body = _post(port, _request_bytes(serve, 2, seed=7))
    assert status == 200
    assert np.load(io.BytesIO(body))["pred"].shape == (2, 99, 99, 16)

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/healthz")
    r = conn.getresponse()
    assert r.status == 200
    import json

    h = json.loads(r.read())
    assert h["status"] == "ok" and h["batch_size"] == 2


def test_predict_validation(server):
    srv, _, serve = server
    port = srv.server_address[1]

    # missing keys -> 400
    buf = io.BytesIO()
    np.savez(buf, img=np.zeros((1, 2, 2, 2, 3), np.float32))
    status, body = _post(port, buf.getvalue())
    assert status == 400 and b"missing" in body

    # oversized batch -> 400
    status, body = _post(port, _request_bytes(serve, 3, seed=1))
    assert status == 400
