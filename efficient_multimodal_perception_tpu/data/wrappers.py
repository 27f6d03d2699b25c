"""Dataset wrappers: Repeat, Concat, class-balanced resampling.

Ports of ``mmdet3d/datasets/dataset_wrappers.py`` (CBGSDataset :6-50) and
the mmdet Repeat/Concat wrappers wired by ``datasets/builder.py:18-49``.
Wrappers compose over any object with ``__len__`` and
``sample(i)/batch(idx)``.
"""

from __future__ import annotations

import numpy as np


class RepeatDataset:
    """Repeat a dataset ``times`` times (epoch lengthening)."""

    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times

    def __len__(self):
        return len(self.dataset) * self.times

    def sample(self, i):
        return self.dataset.sample(i % len(self.dataset))

    def batch(self, idx):
        return self.dataset.batch([i % len(self.dataset) for i in idx])


class ConcatDataset:
    """Concatenate datasets with compatible sample schemas."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def _locate(self, i):
        d = int(np.searchsorted(self.offsets, i, side="right")) - 1
        return self.datasets[d], i - int(self.offsets[d])

    def sample(self, i):
        d, j = self._locate(i)
        return d.sample(j)

    def batch(self, idx):
        located = [self._locate(i) for i in idx]
        first_ds = located[0][0]
        if all(d is first_ds for d, _ in located):
            return first_ds.batch([j for _, j in located])
        # batch spans a dataset boundary: fetch per-sample batches and
        # concatenate leaves along the batch axis
        import jax

        singles = [d.batch([j]) for d, j in located]
        return jax.tree.map(
            lambda *leaves: np.concatenate(leaves, axis=0), *singles
        )


class CBGSDataset:
    """Class-balanced grouping and sampling (CBGS).

    Port of ``dataset_wrappers.py:6-50``: duplicate sample indices so
    every category's frequency approaches 1/num_classes.  Requires the
    wrapped dataset to expose ``get_cat_ids(i) -> set[int]`` and
    ``num_classes``.
    """

    def __init__(self, dataset, seed: int = 0):
        self.dataset = dataset
        self.sample_indices = self._balanced_indices(seed)

    def _balanced_indices(self, seed):
        n_cls = self.dataset.num_classes
        class_sample_idxs = {c: [] for c in range(n_cls)}
        for i in range(len(self.dataset)):
            for c in self.dataset.get_cat_ids(i):
                class_sample_idxs[c].append(i)
        duplicated = sum(len(v) for v in class_sample_idxs.values())
        frac = 1.0 / n_cls
        ratios = [
            frac / (len(v) / duplicated) if v else 0.0
            for v in class_sample_idxs.values()
        ]
        rng = np.random.default_rng(seed)
        out = []
        for (c, idxs), r in zip(class_sample_idxs.items(), ratios):
            if idxs:
                out += list(rng.choice(idxs, int(len(idxs) * r)))
        return out

    def __len__(self):
        return len(self.sample_indices)

    def sample(self, i):
        return self.dataset.sample(self.sample_indices[i])

    def batch(self, idx):
        return self.dataset.batch([self.sample_indices[i] for i in idx])
