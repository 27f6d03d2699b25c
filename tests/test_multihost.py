"""Multi-host input-path correctness (without multiple processes).

The reference uses mmcv's DistributedSampler: every rank shuffles with
the same seed and loads only its slice of each global batch (reference
``tools/train.py:141-148``).  Here that law lives in
``parallel.mesh.process_local_indices`` + ``epoch_batches(process_*)``
and assembly in ``shard_batch`` via
``jax.make_array_from_process_local_data``.  These tests prove:

1. rank slices are disjoint, cover the global batch, and concatenate in
   rank order to the single-process batch exactly;
2. the ``make_array_from_process_local_data`` assembly path yields the
   same global array as the single-process ``device_put`` path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_multimodal_perception_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    process_local_indices,
    shard_batch,
)


def test_process_local_indices_partition():
    order = np.random.default_rng(0).permutation(64)
    B, world = 16, 4
    for step in range(3):
        global_slice = order[step * B : (step + 1) * B]
        parts = [
            process_local_indices(order, B, step, r, world)
            for r in range(world)
        ]
        # disjoint, rank-ordered concatenation == single-process batch
        np.testing.assert_array_equal(np.concatenate(parts), global_slice)
        assert all(len(p) == B // world for p in parts)

    with pytest.raises(ValueError):
        process_local_indices(order, 10, 0, 0, 4)


class _ArrayDS:
    """Minimal dataset: sample i -> dict of arrays derived from i."""

    cfg = {"workers": 1}

    def __len__(self):
        return 32

    def set_epoch(self, e):
        pass

    def batch(self, idx):
        idx = np.asarray(idx)
        return {
            "x": np.stack([np.full((3,), i, np.float32) for i in idx]),
            "i": idx.astype(np.int32),
        }


def test_epoch_batches_rank_slices_reassemble():
    from efficient_multimodal_perception_tpu.data.nuscenes import (
        epoch_batches,
    )

    ds = _ArrayDS()
    B, world = 8, 2
    single = list(epoch_batches(ds, B, seed=3, workers=1))
    per_rank = [
        list(
            epoch_batches(
                ds, B, seed=3, workers=1, process_index=r, process_count=world
            )
        )
        for r in range(world)
    ]
    assert len(single) == len(per_rank[0]) == len(per_rank[1])
    for step in range(len(single)):
        reassembled = jax.tree.map(
            lambda *leaves: np.concatenate(leaves, axis=0),
            *[per_rank[r][step] for r in range(world)],
        )
        jax.tree.map(
            np.testing.assert_array_equal, reassembled, single[step]
        )


def test_make_array_from_process_local_data_matches_device_put():
    """With process_count==1 the local data IS the global batch; the
    multi-process assembly primitive must produce the same sharded array
    as shard_batch's device_put path."""
    mesh = make_mesh()
    n = mesh.devices.size
    batch = {"x": np.arange(n * 4, dtype=np.float32).reshape(n, 4)}
    via_put = shard_batch(batch, mesh)
    s = batch_sharding(mesh)
    via_mpld = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(s, x), batch
    )
    np.testing.assert_array_equal(
        np.asarray(via_put["x"]), np.asarray(via_mpld["x"])
    )
    assert via_mpld["x"].sharding == s
    # each device holds exactly its batch row
    for shard in via_mpld["x"].addressable_shards:
        np.testing.assert_array_equal(
            np.asarray(shard.data), batch["x"][shard.index]
        )
