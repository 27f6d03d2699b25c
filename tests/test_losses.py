"""Loss parity tests vs torch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficient_multimodal_perception_tpu.losses.sup_con import sup_con_loss
from efficient_multimodal_perception_tpu.models.heads import (
    cross_entropy_ignore,
    masked_mse_loss,
)

torch = pytest.importorskip("torch")


def test_cross_entropy_ignore_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 5, 5, 4)).astype(np.float32)
    target = rng.integers(0, 4, (2, 5, 5)).astype(np.int32)
    target[0, 0, :] = 255
    ours = float(cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(target)))
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(target.astype(np.int64)),
        ignore_index=255,
    ).item()
    assert abs(ours - ref) < 1e-6


def test_masked_mse_matches_reference_formula():
    rng = np.random.default_rng(1)
    pred = rng.standard_normal((2, 8, 8)).astype(np.float32)
    tgt = rng.standard_normal((2, 8, 8)).astype(np.float32)
    mask = (rng.random((2, 8, 8)) > 0.5).astype(np.float32)
    ours = float(masked_mse_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask)))
    ref = (((pred * mask - tgt * mask) ** 2).sum() / (mask.sum() + 1e-8))
    assert abs(ours - ref) < 1e-5


def _torch_supcon(features, labels, anchor_indices, T=0.07):
    """Literal port of sup_con_loss.py:52-83 with given anchors."""
    f = torch.nn.functional.normalize(torch.from_numpy(features), dim=-1)
    labels = torch.from_numpy(labels).view(-1, 1)
    anchor_feature = f[anchor_indices]
    logits = anchor_feature @ f.T / T
    logits = logits - logits.max(dim=1, keepdim=True)[0].detach()
    mask = torch.eq(labels[anchor_indices], labels.T).float()
    logits_mask = torch.ones_like(mask)
    logits_mask[torch.arange(len(anchor_indices)), anchor_indices] = 0
    mask = mask * logits_mask
    exp_logits = torch.exp(logits) * logits_mask
    log_prob = logits - torch.log(exp_logits.sum(1, keepdim=True))
    mean_log_prob_pos = (mask * log_prob).sum(1) / mask.sum(1)
    return (-mean_log_prob_pos).mean().item()


def test_sup_con_matches_torch_oracle():
    """Clusters with identical member features -> anchor choice is
    irrelevant, so our random anchor == any oracle anchor."""
    rng = np.random.default_rng(2)
    n_clusters, per = 4, 12
    protos = rng.standard_normal((n_clusters, 16)).astype(np.float32)
    feats = np.repeat(protos, per, axis=0)
    labels = np.repeat(np.arange(1, n_clusters + 1), per).astype(np.int32)
    valid = np.ones(len(labels), bool)

    ours, ok = sup_con_loss(
        jnp.asarray(feats),
        jnp.asarray(labels),
        jnp.asarray(valid),
        jax.random.key(0),
        max_clusters=8,
    )
    assert bool(ok)
    anchors = [np.where(labels == c)[0][0] for c in range(1, n_clusters + 1)]
    ref = _torch_supcon(feats, labels.astype(np.int64), anchors)
    assert abs(float(ours) - ref) < 1e-4


def test_sup_con_small_clusters_skipped():
    """Clusters under 10 members are ineligible (sup_con_loss.py:43-44)."""
    feats = np.random.default_rng(3).standard_normal((9, 8)).astype(np.float32)
    labels = np.ones(9, np.int32)
    loss, ok = sup_con_loss(
        jnp.asarray(feats),
        jnp.asarray(labels),
        jnp.ones(9, bool),
        jax.random.key(0),
        max_clusters=4,
    )
    assert not bool(ok)
    assert float(loss) == 0.0


def test_sup_con_padding_invariance():
    """Padded rows must not change the loss."""
    rng = np.random.default_rng(4)
    protos = rng.standard_normal((2, 8)).astype(np.float32)
    feats = np.repeat(protos, 20, axis=0)  # identical members ->
    labels = np.repeat([1, 2], 20).astype(np.int32)  # anchor-invariant
    valid = np.ones(40, bool)

    l1, _ = sup_con_loss(
        jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(valid),
        jax.random.key(5), max_clusters=4,
    )
    pad_feats = np.concatenate([feats, rng.standard_normal((17, 8)).astype(np.float32)])
    pad_labels = np.concatenate([labels, np.full(17, 3, np.int32)])
    pad_valid = np.concatenate([valid, np.zeros(17, bool)])
    l2, _ = sup_con_loss(
        jnp.asarray(pad_feats), jnp.asarray(pad_labels), jnp.asarray(pad_valid),
        jax.random.key(5), max_clusters=4,
    )
    assert abs(float(l1) - float(l2)) < 1e-5
