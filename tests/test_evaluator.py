"""Sharded eval == B=1 eval, bit-for-bit (VERDICT round-1 item 4).

The reference evaluates strictly sample-at-a-time (``apis/test.py:33``);
our evaluator computes per-SAMPLE scores/losses inside the jit so a
B=n_devices batch sharded over the data mesh aggregates identically.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from tiny import tiny_occ  # noqa: E402

from efficient_multimodal_perception_tpu.data.synthetic import (  # noqa: E402
    synthetic_batch,
)
from efficient_multimodal_perception_tpu.models.builder import (  # noqa: E402
    build_model,
)
from efficient_multimodal_perception_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
)
from efficient_multimodal_perception_tpu.train.evaluator import (  # noqa: E402
    evaluate,
    per_sample_ce,
)


def _singles(n):
    return [
        synthetic_batch(1, point_budget=2048, with_occ=True, seed=100 + i)
        for i in range(n)
    ]


def test_sharded_eval_matches_b1_bitwise():
    mesh = make_mesh()
    n = mesh.devices.size
    singles = _singles(n)
    model = build_model(tiny_occ())
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.key(0)}, b, deterministic=True
        )
    )(singles[0])

    m1 = evaluate(model, variables, singles, "TriplaneOcc", num_classes=5)

    big = jax.tree.map(
        lambda *ls: jnp.concatenate(ls, axis=0), *singles
    )
    m8 = evaluate(
        model, variables, [big], "TriplaneOcc", num_classes=5, mesh=mesh
    )

    assert m1["iou"] == m8["iou"]
    assert m1["miou"] == m8["miou"]
    np.testing.assert_allclose(m1["ce"], m8["ce"], rtol=1e-6)


def test_per_sample_ce_matches_global_at_b1():
    """per_sample_ce at B=1 equals the head's valid-mean CE (what the
    model loss reports at eval, triplane_occ.py:186-191)."""
    from efficient_multimodal_perception_tpu.models.heads import (
        cross_entropy_ignore,
    )

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((1, 9, 9, 4, 5)), jnp.float32)
    tgt = rng.integers(0, 5, (1, 9, 9, 4))
    tgt = np.where(rng.random((1, 9, 9, 4)) < 0.3, 255, tgt)
    tgt = jnp.asarray(tgt, jnp.int32)
    np.testing.assert_allclose(
        np.asarray(per_sample_ce(logits, tgt))[0],
        float(cross_entropy_ignore(logits, tgt)),
        rtol=1e-6,
    )
