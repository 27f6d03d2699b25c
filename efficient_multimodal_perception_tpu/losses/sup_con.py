"""Multi-positive supervised contrastive loss over SAM clusters.

Static-shape rebuild of ``mmdet3d/losses/sup_con_loss.py``.  The
reference's anchor selection is data-dependent python (unique labels,
count >= 10, one random member each, ``sup_con_loss.py:39-50``); here it
is a bounded-label-id segment computation:

* cluster ids are assumed < ``max_clusters`` (SAM mask indices are small
  ints; ``sam/create_sam_masks.py:157-163`` labels points with per-image
  mask indices),
* per-cluster counts come from a segment_sum, eligibility = count >= 10,
* the random member per cluster is the segment-argmax of i.i.d. uniform
  scores — identical in distribution to the reference's randint pick.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MIN_CLUSTER_SIZE = 10


def sup_con_loss(
    features: jax.Array,
    labels: jax.Array,
    valid: jax.Array,
    rng: jax.Array,
    max_clusters: int = 256,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
):
    """SupCon loss for one (sample, camera) label channel.

    Args:
        features: ``(P, C)`` per-point features (will be L2-normalized).
        labels: ``(P,)`` int cluster ids; only ``valid`` rows count.
        valid: ``(P,)`` bool (= label > 0 & in-range & real point).
        rng: key for anchor choice.
        max_clusters: static bound on cluster ids.

    Returns:
        ``(loss, has_anchor)``: scalar loss (0 when no eligible cluster)
        and a bool matching the reference's "loss is not None" count
        (``triplane.py:456-462``).
    """
    P, C = features.shape
    feats = features * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(features**2, axis=-1, keepdims=True), 1e-24)
    )

    lab = jnp.where(valid, labels, max_clusters).astype(jnp.int32)
    counts = jax.ops.segment_sum(
        jnp.ones((P,), jnp.int32), lab, num_segments=max_clusters + 1
    )[:max_clusters]
    eligible = counts >= MIN_CLUSTER_SIZE

    # random member per cluster via segment-argmax of uniform scores
    scores = jax.random.uniform(rng, (P,))
    best = jax.ops.segment_max(
        jnp.where(valid, scores, -1.0), lab, num_segments=max_clusters + 1
    )[:max_clusters]
    is_best = valid & (scores == best[lab.clip(0, max_clusters - 1)])
    idx = jnp.arange(P, dtype=jnp.int32)
    anchor_idx = jax.ops.segment_min(
        jnp.where(is_best, idx, P), lab, num_segments=max_clusters + 1
    )[:max_clusters]
    anchor_ok = eligible & (anchor_idx < P)
    anchor_idx = jnp.clip(anchor_idx, 0, P - 1)

    anchor_feat = feats[anchor_idx]  # (M, C)
    anchor_lab = lab[anchor_idx]

    logits = (anchor_feat @ feats.T) / temperature  # (M, P)
    logits = jnp.where(valid[None, :], logits, -jnp.inf)
    logits = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=1, keepdims=True)
    )

    pos_mask = (anchor_lab[:, None] == lab[None, :]) & valid[None, :]
    self_mask = anchor_idx[:, None] == idx[None, :]
    logits_mask = valid[None, :] & ~self_mask
    pos_mask = pos_mask & ~self_mask

    exp_logits = jnp.where(logits_mask, jnp.exp(logits), 0.0)
    log_prob = logits - jnp.log(
        jnp.maximum(exp_logits.sum(axis=1, keepdims=True), 1e-24)
    )
    pos = pos_mask.astype(log_prob.dtype)
    mean_log_prob_pos = (pos * jnp.where(pos_mask, log_prob, 0.0)).sum(
        axis=1
    ) / jnp.maximum(pos.sum(axis=1), 1.0)

    per_anchor = -(temperature / base_temperature) * mean_log_prob_pos
    ok = anchor_ok.astype(per_anchor.dtype)
    loss = (per_anchor * ok).sum() / jnp.maximum(ok.sum(), 1.0)
    return loss, anchor_ok.any()
