"""Fold construction: KFold / GroupKFold / train-test split.

The reference leans on sklearn (cross_validation.py:63,
forward_selection_integration.py:425-450, cross_validation.py:317-321).
We use sklearn when importable (seed-identical folds to the reference) and
provide algorithm-faithful numpy fallbacks otherwise.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def kfold_split(n: int, n_splits: int, shuffle: bool = True,
                random_state: int = 42) -> List[Tuple[np.ndarray, np.ndarray]]:
    """sklearn.model_selection.KFold-compatible splits over range(n)."""
    try:
        from sklearn.model_selection import KFold
        kf = KFold(n_splits=n_splits, shuffle=shuffle,
                   random_state=random_state if shuffle else None)
        return [(tr, va) for tr, va in kf.split(np.arange(n))]
    except ImportError:  # pragma: no cover
        idx = np.arange(n)
        if shuffle:
            np.random.RandomState(random_state).shuffle(idx)
        sizes = np.full(n_splits, n // n_splits)
        sizes[: n % n_splits] += 1
        out, cur = [], 0
        for s in sizes:
            va = idx[cur: cur + s]
            tr = np.concatenate([idx[:cur], idx[cur + s:]])
            out.append((np.sort(tr), va))
            cur += s
        return out


def group_kfold_split(groups: Sequence, n_splits: int
                      ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """sklearn GroupKFold-compatible: no group straddles train/val
    (the leakage guard of forward_selection_integration.py:425-450)."""
    groups = np.asarray(groups)
    try:
        from sklearn.model_selection import GroupKFold
        gkf = GroupKFold(n_splits=n_splits)
        return [(tr, va) for tr, va in
                gkf.split(np.arange(len(groups)), groups=groups)]
    except ImportError:  # pragma: no cover
        uniq, counts = np.unique(groups, return_counts=True)
        order = np.argsort(-counts)
        fold_of = {}
        weights = np.zeros(n_splits)
        for g in uniq[order]:
            f = int(np.argmin(weights))
            fold_of[g] = f
            weights[f] += np.sum(groups == g)
        out = []
        for f in range(n_splits):
            mask = np.array([fold_of[g] == f for g in groups])
            out.append((np.where(~mask)[0], np.where(mask)[0]))
        return out


def train_test_split_indices(n: int, test_size: float = 0.2,
                             random_state: int = 42
                             ) -> Tuple[List[int], List[int]]:
    """sklearn.train_test_split-compatible index split
    (cross_validation.py:317-321)."""
    try:
        from sklearn.model_selection import train_test_split
        tr, te = train_test_split(list(range(n)), test_size=test_size,
                                  random_state=random_state)
        return tr, te
    except ImportError:  # pragma: no cover
        idx = np.random.RandomState(random_state).permutation(n)
        n_test = int(np.ceil(n * test_size))
        return list(idx[n_test:]), list(idx[:n_test])
