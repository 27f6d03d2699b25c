"""Implicit surface decoder (POCO/ALSO-style), static-shape.

Rebuild of ``mmdet3d/models/dense_heads/interpnet.py``.  Differences by
design (ragged -> static):

* ``create_targets`` samples the three non-manifold query thirds
  (inside +d, outside -d, out-far toward origin,
  ``interpnet.py:141-183``) from a *padded* point set via masked top-k of
  uniform scores — same distribution as ``torch.randperm(...)[:n]``.
* the radius search is the fixed-K kernel in ``ops/radius.py``; the BCE
  is a masked mean over (query, neighbor) pairs.  The reference averages
  over a data-dependent pair count; the masked mean matches it exactly
  for the pairs present.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.radius import radius_neighbors


class InterpNet(nn.Module):
    """MLP decoder over [latent || relative-pos] with BCE occupancy loss.

    Attributes mirror ``interpnet.py:25-44``.
    """

    latent_size: int = 32
    out_channels: int = 1
    radius: float = 1.0
    n_non_manifold_pts: int = 2048
    non_manifold_dist: float = 0.1
    k_neighbors: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def decode(self, x):
        """fc_in -> 2x(ReLU, fc) -> fc_out (``interpnet.py:35-38,76-79``)."""
        x = nn.Dense(self.latent_size, dtype=self.dtype, name="fc_in")(x)
        for i in range(2):
            x = nn.Dense(
                self.latent_size, dtype=self.dtype, name=f"mlp_{i}"
            )(nn.relu(x))
        return nn.Dense(self.out_channels, dtype=self.dtype, name="fc_out")(x)

    def __call__(self, points, latents, valid, rng):
        """Create targets + neighborhood decode + BCE, per sample.

        Args:
            points: ``(B, P, 3)`` padded support points (LiDAR frame).
            latents: ``(B, P, C)`` per-point triplane features.
            valid: ``(B, P)`` support validity.
            rng: PRNG key for query sampling.

        Returns:
            scalar surface BCE loss.
        """

        def per_sample(args):
            pts, lat, val, key = args
            q, occ, q_valid = self.create_targets(pts, val, key)
            idx, mask = radius_neighbors(
                q, pts, val, self.radius, self.k_neighbors
            )
            rel = q[:, None, :] - pts[idx]  # (Q, K, 3)
            lat_n = lat[idx]  # (Q, K, C)
            x = jnp.concatenate([lat_n, rel.astype(lat_n.dtype)], axis=-1)
            logits = self.decode(x)[..., 0]  # (Q, K)
            occ_pairs = jnp.broadcast_to(occ[:, None], logits.shape)
            bce = _bce_with_logits(logits, occ_pairs.astype(logits.dtype))
            m = (mask & q_valid[:, None]).astype(logits.dtype)
            return (bce * m).sum(), m.sum()

        B = points.shape[0]
        keys = jax.random.split(rng, B)
        num, den = jax.vmap(lambda p, l, v, k: per_sample((p, l, v, k)))(
            points, latents, valid, keys
        )
        return num.sum() / jnp.maximum(den.sum(), 1.0)

    def create_targets(self, pts, valid, key):
        """Sample non-manifold queries + occupancy labels for one sample.

        Port of ``interpnet.py:141-183``: thirds are (in: +d*rand along
        the ray, occupied=1), (out: -d*rand, 0), (out-far: scaled toward
        origin by rand, 0).  When a sample has fewer valid points than a
        third's budget, the surplus picks are marked invalid (the
        reference's ``randperm`` simply draws fewer) and masked out of
        the loss; returns ``(queries, occupancies, query_valid)``.
        """
        n = self.n_non_manifold_pts
        n_out = n // 3
        n_far = n // 3
        n_in = n - 2 * (n // 3)

        k_sel, k_in, k_out, k_far = jax.random.split(key, 4)

        def pick(k, count):
            scores = jax.random.uniform(k, (pts.shape[0],))
            scores = jnp.where(valid, scores, -1.0)
            top, idx = jax.lax.top_k(scores, count)
            return pts[idx], top >= 0.0

        eps = 1e-12

        def unit(v):
            return v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), eps
            )

        p_in, v_in = pick(jax.random.fold_in(k_sel, 0), n_in)
        r_in = jax.random.uniform(k_in, (n_in, 1), dtype=pts.dtype)
        q_in = p_in + self.non_manifold_dist * unit(p_in) * r_in

        p_out, v_out = pick(jax.random.fold_in(k_sel, 1), n_out)
        r_out = jax.random.uniform(k_out, (n_out, 1), dtype=pts.dtype)
        q_out = p_out - self.non_manifold_dist * unit(p_out) * r_out

        p_far, v_far = pick(jax.random.fold_in(k_sel, 2), n_far)
        r_far = jax.random.uniform(k_far, (n_far, 1), dtype=pts.dtype)
        q_far = p_far * r_far

        q = jnp.concatenate([q_in, q_out, q_far], axis=0)
        occ = jnp.concatenate(
            [
                jnp.ones((n_in,), jnp.int32),
                jnp.zeros((n_out + n_far,), jnp.int32),
            ]
        )
        q_valid = jnp.concatenate([v_in, v_out, v_far], axis=0)
        return q, occ, q_valid

    def test_forward(self, x):
        """Raw decode for visualization (``interpnet.py:94-110``)."""
        return self.decode(x)[..., 0]


def _bce_with_logits(logits, targets):
    """Numerically stable BCE-with-logits (per element)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
