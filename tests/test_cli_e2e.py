"""Fixture-data end-to-end CLI rehearsal (VERDICT r4 #8).

``tools/train.py`` → checkpoint → ``tools/test.py`` over a FILE-BACKED
fixture dataset (fake-devkit infos pkl + images/lidar bins/range npz
written by the converter helpers) — not ``synthetic_batch`` — so the
disk → pipeline → ``Batch`` path is exercised through the real CLIs,
exactly the reference's train→test loop (``/root/reference/tools/
train.py`` + ``tools/test.py``).
"""

from __future__ import annotations

import os
import subprocess
import sys

# reuse the fake-devkit world + converter-artifact helpers
from test_converter import fake_devkit, prepare_fixture_dataset  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(argv, cwd=REPO, timeout=900):
    # JAX_PLATFORMS=cpu is honored by the CLIs themselves (the axon
    # sitecustomize would otherwise override it and route the subprocess
    # through the single-client TPU tunnel); pin ONE CPU device so the
    # default eval batch size / data mesh don't depend on the parent
    # pytest's 8-virtual-device XLA_FLAGS.
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    r = subprocess.run(
        [sys.executable] + argv,
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert r.returncode == 0, (
        f"{argv} failed:\nSTDOUT:{r.stdout[-3000:]}\nSTDERR:{r.stderr[-3000:]}"
    )
    return r.stdout


def test_cli_train_then_eval_on_fixture_files(fake_devkit):
    root = fake_devkit
    prepare_fixture_dataset(root)
    work = os.path.join(root, "work")

    out = _run([
        "tools/train.py", "tiny_occ_run",
        "--data-root", root,
        "--work-dir", work,
        "--max-steps", "2",
        "--cfg-options", "log_interval=1", "checkpoint.interval=2",
        "data.point_budget=512",
    ])
    assert "loss" in out
    ckpt = os.path.join(work, "checkpoints", "step_2")
    assert os.path.isdir(ckpt), out[-2000:]

    out = _run([
        "tools/test.py", "tiny_occ_run",
        "--data-root", root,
        "--checkpoint", ckpt,
        "--num-samples", "1",
        "--cfg-options", "data.point_budget=512",
    ])
    # the occ metric line (reference triplane_occ.py:468-500 protocol)
    assert "mIoU" in out or "miou" in out, out[-2000:]


def test_golden_eval_metrics_on_fixture(fake_devkit):
    """Golden end-to-end IoU regression (VERDICT r4 #6).

    Locks the EXACT ``CE / IoU / mIoU`` values ``tools/test.py`` prints
    for a fixed-seed (``jax.random.key(0)``) *untrained* tiny_occ model
    over the file-backed fixture world, f32 on one CPU device — so
    silent numerical drift anywhere in the disk → pipeline → model →
    ``evaluation_semantic`` aggregation chain (reference
    ``triplane_occ.py:468-500`` + ``apis/test.py:44-74``) is caught
    whole-pipeline, not just per-module.  Regenerate by running the
    printed command when numerics change INTENTIONALLY (keep in sync
    with tests/test_golden.py policy).
    """
    root = fake_devkit
    prepare_fixture_dataset(root)

    out = _run([
        "tools/test.py", "tiny_occ_run",
        "--data-root", root,
        "--num-samples", "1",
        "--batch-size", "1",
        "--cfg-options", "data.point_budget=512",
    ])
    got = {}
    for line in out.splitlines():
        if line.startswith("CE:"):
            got["ce"] = line.split()[-1]
        elif line.startswith("IoU (geometry):"):
            got["iou"] = line.split()[-1]
        elif line.startswith("mIoU:"):
            got["miou"] = line.split()[-1]
    golden = {"ce": "1.0091", "iou": "0.0005", "miou": "0.0002"}
    assert got == golden, f"eval drifted: got {got}, golden {golden}"
