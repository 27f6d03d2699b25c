"""Torch parity for the two STOCHASTIC pretrain losses.

The full-forward MAE parity test (``test_full_parity.test_full_mae_losses``)
covers the deterministic reconstruction losses; the surface (InterpNet
BCE, ``mmdet3d/models/dense_heads/interpnet.py:46-92``) and contrastive
(SupCon, ``mmdet3d/losses/sup_con_loss.py:5-83``) losses draw runtime
randomness (query selection, anchor picks), so they are proven here by
*replaying the jax-side draws into a literal torch restatement*:

* InterpNet: ``create_targets`` is deterministic given its key, so the
  torch side consumes the exact queries the jax loss used and restates
  radius search (torch_geometric first-K contract), the MLP decode, and
  the masked-pair BCE aggregation.
* SupCon: the anchor pick is a segment-argmax of ``uniform(key, (P,))``
  — recomputable in the test — and the picked anchors feed the literal
  torch port (``test_losses._torch_supcon``).

Together with the deterministic full-forward test this closes loss
parity for all five MAE pretrain loss keys.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from efficient_multimodal_perception_tpu.losses.sup_con import sup_con_loss
from efficient_multimodal_perception_tpu.models.interpnet import InterpNet

from test_losses import _torch_supcon


def test_interpnet_loss_matches_torch():
    """Full InterpNet.__call__ == torch restatement on shared weights
    and identical (key-derived) non-manifold queries."""
    B, P, C = 2, 400, 16
    rng_np = np.random.default_rng(3)
    pts = rng_np.uniform(-4, 4, (B, P, 3)).astype(np.float32)
    lat = rng_np.standard_normal((B, P, C)).astype(np.float32)
    valid = np.ones((B, P), bool)
    valid[0, 350:] = False
    # sample 1 has fewer valid points than the 90-query budget's thirds
    # -> exercises the q_valid surplus masking
    valid[1, 25:] = False

    mod = InterpNet(
        latent_size=16,
        radius=1.5,
        n_non_manifold_pts=90,
        non_manifold_dist=0.1,
        k_neighbors=8,
    )
    key = jax.random.key(11)
    variables = mod.init(
        jax.random.key(0), jnp.asarray(pts), jnp.asarray(lat),
        jnp.asarray(valid), key,
    )
    with jax.default_matmul_precision("highest"):
        ours = float(
            jax.jit(
                lambda v: mod.apply(
                    v, jnp.asarray(pts), jnp.asarray(lat),
                    jnp.asarray(valid), key,
                )
            )(variables)
        )

    # ---- torch restatement ----
    p = variables["params"]

    def lin(name):
        w = torch.from_numpy(np.asarray(p[name]["kernel"]))
        b = torch.from_numpy(np.asarray(p[name]["bias"]))
        return lambda x: x @ w + b

    fc_in, mlp0, mlp1, fc_out = (
        lin("fc_in"), lin("mlp_0"), lin("mlp_1"), lin("fc_out")
    )

    def decode(x):
        # fc_in -> 2x(relu, fc) -> fc_out, relu NOT applied before the
        # output layer (interpnet.py:35-38,76-79)
        x = fc_in(x)
        x = mlp0(torch.relu(x))
        x = mlp1(torch.relu(x))
        return fc_out(x)

    keys = jax.random.split(key, B)
    num = 0.0
    den = 0.0
    K = mod.k_neighbors
    for b in range(B):
        q, occ, q_valid = jax.tree.map(
            np.asarray,
            mod.create_targets(
                jnp.asarray(pts[b]), jnp.asarray(valid[b]), keys[b]
            ),
        )
        Q = q.shape[0]
        d2 = ((q[:, None] - pts[b][None]) ** 2).sum(-1)
        d2[:, ~valid[b]] = np.inf
        idx = np.zeros((Q, K), np.int64)
        mask = np.zeros((Q, K), bool)
        for i in range(Q):
            within = np.where(d2[i] <= mod.radius**2)[0][:K]
            idx[i, : len(within)] = within
            mask[i, : len(within)] = True
        rel = torch.from_numpy(q[:, None, :] - pts[b][idx])  # (Q, K, 3)
        lat_n = torch.from_numpy(lat[b][idx])  # (Q, K, C)
        logits = decode(torch.cat([lat_n, rel], dim=-1))[..., 0]
        occ_pairs = torch.from_numpy(
            np.broadcast_to(occ[:, None], logits.shape).astype(np.float32)
        )
        bce = torch.nn.functional.binary_cross_entropy_with_logits(
            logits, occ_pairs, reduction="none"
        )
        m = torch.from_numpy(
            (mask & q_valid[:, None]).astype(np.float32)
        )
        num += float((bce * m).sum())
        den += float(m.sum())
    ref = num / max(den, 1.0)
    assert den > 0
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_sup_con_arbitrary_features_matches_torch():
    """General-feature SupCon parity: replay the key-derived anchor
    picks (segment-argmax of uniform scores) into the literal torch
    port — unlike the identical-member oracle test, the anchor CHOICE
    matters here."""
    P, C = 220, 16
    rng_np = np.random.default_rng(7)
    feats = rng_np.standard_normal((P, C)).astype(np.float32)
    # clusters 1..5 (sizes 50,50,50,50,12 — all eligible) plus label 6
    # with 8 members, under the >=10 threshold -> ineligible
    labels = np.concatenate(
        [
            np.repeat(np.arange(1, 6), [50, 50, 50, 50, 12]),
            np.full(8, 6),
        ]
    ).astype(np.int32)
    assert labels.shape[0] == P
    valid = np.ones(P, bool)

    key = jax.random.key(17)
    with jax.default_matmul_precision("highest"):
        ours, ok = jax.jit(
            lambda f, l, v: sup_con_loss(f, l, v, key, max_clusters=16)
        )(jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(valid))
    assert bool(ok)

    # replay the anchor draw: segment-argmax of uniform(key, (P,))
    scores = np.asarray(jax.random.uniform(key, (P,)))
    anchors = []
    for c in range(1, 7):
        members = np.where(labels == c)[0]
        if len(members) >= 10:
            anchors.append(int(members[np.argmax(scores[members])]))
    assert len(anchors) == 5  # label-6 cluster (8 members) ineligible
    ref = _torch_supcon(feats, labels.astype(np.int64), anchors)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-4, atol=1e-5)


def test_create_targets_geometry():
    """The one InterpNet piece the replay tests can't cover: the
    key->queries map itself.  Verify the reference's geometric
    construction (interpnet.py:141-183) per third: ``in`` queries sit
    +d*r beyond a valid support point ALONG ITS RAY (occupied=1),
    ``out`` queries -d*r before one (0), ``out far`` queries are a
    valid point scaled toward the origin (0); surplus picks beyond the
    valid count are flagged invalid."""
    P = 120
    rng_np = np.random.default_rng(9)
    pts = rng_np.uniform(1.0, 6.0, (P, 3)).astype(np.float32)
    valid = np.ones(P, bool)
    valid[12:] = False  # 12 valid points < the 30-query thirds

    mod = InterpNet(n_non_manifold_pts=90, non_manifold_dist=0.1)
    q, occ, q_valid = jax.tree.map(
        np.asarray,
        mod.create_targets(
            jnp.asarray(pts), jnp.asarray(valid), jax.random.key(21)
        ),
    )
    n_in = 90 - 2 * 30
    assert (occ[:n_in] == 1).all() and (occ[n_in:] == 0).all()
    # every valid query must be consistent with ONE valid support point
    norms = np.linalg.norm(pts[valid], axis=-1)
    units = pts[valid] / norms[:, None]
    for j in range(90):
        if not q_valid[j]:
            continue
        third = 0 if j < n_in else (1 if j < n_in + 30 else 2)
        if third < 2:
            # q = p +/- d*r*unit(p): same ray, |q|-|p| in [0, d] (in)
            # or [-d, 0] (out)
            delta = q[j][None] - pts[valid]
            proj = np.abs((delta * units).sum(-1))
            perp = np.linalg.norm(
                delta - (delta * units).sum(-1, keepdims=True) * units,
                axis=-1,
            )
            on_ray = (perp < 1e-4) & (proj <= 0.1 + 1e-5)
            qn = np.linalg.norm(q[j])
            sign_ok = (qn >= norms - 1e-5) if third == 0 else (
                qn <= norms + 1e-5
            )
            assert (on_ray & sign_ok).any(), (j, third)
        else:
            # q = r*p for some valid p, r in [0, 1)
            ratios = q[j][None] / pts[valid]
            consistent = (
                np.abs(ratios - ratios[:, :1]).max(-1) < 1e-4
            ) & (ratios[:, 0] >= 0) & (ratios[:, 0] < 1.0)
            assert consistent.any(), j
    # each 30-query third drew from only 12 valid points -> surplus
    # picks flagged invalid (the reference's randperm just draws fewer)
    assert (~q_valid).sum() >= 3 * (30 - 12)
