#!/usr/bin/env python
"""Batching inference server (the TPU serving front end).

The reference has no serving story (its ``tools/test.py`` is an offline
eval loop); this is the deployment-side complement of
``tools/export.py``: an HTTP front end that keeps ONE jitted inference
function compiled at ONE static batch size and coalesces concurrent
requests into it — the shape discipline TPUs need (any other batch size
would retrace/recompile).

    python tools/serve.py triplane_occ --checkpoint ckpts/step_90000 \
        --port 8500 --batch-size 4 [--bf16]

Protocol (stdlib-only, numpy ``.npz`` both ways):

* ``POST /predict`` — body: npz with keys ``img, range_image,
  range_points, lidar2img, cam_resize, cam_crop, cam_flip`` (+
  ``points, points_valid`` for point-family models), each with a
  leading sample axis of size 1..batch_size.  Response: npz with
  ``pred`` (int8 class volume for occupancy, f32 heights for
  elevation).
* ``GET /healthz`` — liveness + request/batch counters.

Design: handler threads enqueue (arrays, future) pairs; a single
inference thread drains the queue, packs up to ``batch_size`` samples
(padding the tail with the warmup sample — static shapes, no retrace),
runs the jitted function, and scatters the slices back.  One inference
thread == one TPU client stream (the axon tunnel is single-client).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_BATCH_KEYS = ("img", "range_image", "range_points", "lidar2img",
               "cam_resize", "cam_crop", "cam_flip")
_OPT_KEYS = ("points", "points_valid")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--batch-size", type=int, default=4,
                   help="the ONE static batch size the model compiles at")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="quantized serving: dynamic int8 GEMMs "
                   "(ops/quant.py) in encoder/neck/decoder")
    p.add_argument("--coalesce-ms", type=float, default=5.0,
                   help="max wait after the first queued sample before "
                   "dispatching a partial batch")
    return p.parse_args()


def arrays_to_batch(arrs: dict, template):
    """Assemble a Batch pytree from flat npz-style arrays."""
    import dataclasses

    from efficient_multimodal_perception_tpu.core.geometry import CameraAug

    cam_aug = CameraAug(
        resize=arrs["cam_resize"],
        crop=arrs["cam_crop"],
        flip=arrs["cam_flip"].astype(bool),
    )
    kw = dict(
        img=arrs["img"],
        range_image=arrs["range_image"],
        range_points=arrs["range_points"],
        lidar2img=arrs["lidar2img"],
        cam_aug=cam_aug,
    )
    for k in _OPT_KEYS:
        if k in arrs:
            kw[k] = arrs[k]
        elif getattr(template, k) is not None:
            raise ValueError(f"model requires '{k}' in the request")
    return dataclasses.replace(template, **kw, occupancy=None,
                               elevation=None, elevation_mask=None)


def batch_to_arrays(b) -> dict:
    out = dict(
        img=b.img, range_image=b.range_image, range_points=b.range_points,
        lidar2img=b.lidar2img, cam_resize=b.cam_aug.resize,
        cam_crop=b.cam_aug.crop, cam_flip=b.cam_aug.flip,
    )
    for k in _OPT_KEYS:
        v = getattr(b, k)
        if v is not None:
            out[k] = v
    return {k: np.asarray(v) for k, v in out.items()}


class InferenceWorker(threading.Thread):
    """Single consumer: coalesce queued samples, run the jitted step."""

    def __init__(self, jitted, variables, template, batch_size,
                 coalesce_s):
        super().__init__(daemon=True)
        import jax

        self.jitted = jitted
        self.variables = variables
        self.template = jax.device_get(template)  # host pad filler
        self.B = batch_size
        self.coalesce_s = coalesce_s
        self.q: queue.Queue = queue.Queue()
        self.n_requests = 0
        self.n_batches = 0
        self._tmpl_arrays = batch_to_arrays(self.template)

    def submit(self, arrs: dict):
        """Enqueue one request (n<=B samples); returns its Future-like."""
        done = threading.Event()
        slot = {"done": done}
        self.q.put((arrs, slot))
        return slot

    def _pad_concat(self, key, parts, total):
        """Pad the packed batch to B with warmup-sample copies."""
        pad = self.B - total
        if pad > 0:
            filler = self._tmpl_arrays[key]
            parts = parts + [np.repeat(filler[:1], pad, axis=0)]
        return np.concatenate(parts, axis=0)

    def run(self):
        while True:
            arrs, slot = self.q.get()
            if arrs is None:  # shutdown sentinel
                return
            batch_items = [(arrs, slot)]
            total = next(iter(arrs.values())).shape[0]
            deadline = time.monotonic() + self.coalesce_s
            # coalesce whole requests while they fit
            while total < self.B:
                try:
                    nxt = self.q.get(timeout=max(0.0,
                                                 deadline - time.monotonic()))
                except queue.Empty:
                    break
                if nxt[0] is None:
                    self.q.put(nxt)  # re-deliver the sentinel
                    break
                n = next(iter(nxt[0].values())).shape[0]
                if total + n > self.B:
                    self.q.put(nxt)  # doesn't fit; next round
                    break
                batch_items.append(nxt)
                total += n

            packed = {
                k: self._pad_concat(
                    k, [it[0][k] for it in batch_items], total
                )
                for k in batch_items[0][0]
            }
            try:
                batch = arrays_to_batch(packed, self.template)
                pred = np.asarray(self.jitted(self.variables, batch))
                off = 0
                for it_arrs, it_slot in batch_items:
                    n = next(iter(it_arrs.values())).shape[0]
                    it_slot["pred"] = pred[off:off + n]
                    off += n
                    it_slot["done"].set()
            except Exception as e:  # fault-isolate the whole packed batch
                for _, it_slot in batch_items:
                    it_slot["error"] = f"{type(e).__name__}: {e}"[:300]
                    it_slot["done"].set()
            self.n_requests += len(batch_items)
            self.n_batches += 1


def make_server(cfg_name, checkpoint=None, port=8500, batch_size=4,
                bf16=False, coalesce_ms=5.0, int8=False):
    """Build (HTTPServer, worker); separated from main() for tests."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import jax
    import jax.numpy as jnp

    from efficient_multimodal_perception_tpu.configs import get_config
    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model
    from efficient_multimodal_perception_tpu.train import checkpoint as ckpt

    # tools/ is a scripts dir, not a package: load export.py by path
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_emp_export", os.path.join(os.path.dirname(__file__), "export.py")
    )
    _export = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(_export)
    build_infer_fn = _export.build_infer_fn

    cfg = get_config(cfg_name)
    if bf16:
        cfg["model"]["dtype"] = jnp.bfloat16
    if int8:
        from efficient_multimodal_perception_tpu.ops.quant import enable_int8

        enable_int8(cfg["model"])
    model = build_model(cfg["model"])
    model_type = cfg["model"]["type"]
    if not (model_type.endswith("Occ") or model_type == "TriplaneElev"):
        raise ValueError(
            "serving supports occupancy/elevation task heads; pretrain "
            f"families produce loss dicts (got {model_type})"
        )
    template = synthetic_batch(
        batch_size,
        point_budget=cfg.get("data", {}).get("point_budget", 4096),
        with_occ=model_type.endswith("Occ"),
        with_elev=model_type == "TriplaneElev",
        seed=0,
    )
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            b, deterministic=True,
        )
    )(template)
    if checkpoint:
        restored = ckpt.restore_params_only(checkpoint)
        variables = {**variables, "params": restored.get("params", restored)}
    jitted = jax.jit(build_infer_fn(model, model_type))
    # warmup: compile + first dispatch before accepting traffic
    np.asarray(jitted(variables, template))

    worker = InferenceWorker(jitted, variables, template, batch_size,
                             coalesce_ms / 1e3)
    worker.start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, dict(
                    status="ok", model=model_type,
                    batch_size=batch_size,
                    requests=worker.n_requests, batches=worker.n_batches,
                ))
            else:
                self._json(404, dict(error="unknown path"))

        def do_POST(self):
            if self.path != "/predict":
                return self._json(404, dict(error="unknown path"))
            n = int(self.headers.get("Content-Length", 0))
            try:
                arrs = dict(np.load(io.BytesIO(self.rfile.read(n)),
                                    allow_pickle=False))
                missing = [k for k in _BATCH_KEYS if k not in arrs]
                if missing:
                    return self._json(400, dict(error=f"missing {missing}"))
                ns = {k: v.shape[0] for k, v in arrs.items()}
                if len(set(ns.values())) != 1:
                    return self._json(400, dict(error=f"ragged sizes {ns}"))
                if not 1 <= next(iter(ns.values())) <= batch_size:
                    return self._json(
                        400, dict(error=f"1..{batch_size} samples required")
                    )
            except Exception as e:
                return self._json(400, dict(error=str(e)[:300]))
            slot = worker.submit(arrs)
            slot["done"].wait()
            if "error" in slot:
                return self._json(500, dict(error=slot["error"]))
            buf = io.BytesIO()
            np.savez(buf, pred=slot["pred"])
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-npz")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    return server, worker


def main():
    args = parse_args()
    server, _ = make_server(
        args.config, checkpoint=args.checkpoint, port=args.port,
        batch_size=args.batch_size, bf16=args.bf16,
        coalesce_ms=args.coalesce_ms, int8=args.int8,
    )
    print(f"serving on 127.0.0.1:{server.server_address[1]} "
          f"(POST /predict, GET /healthz)", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
