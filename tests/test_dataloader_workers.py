"""Worker-process DataLoader: parity with inline loading, ordering, crash surfacing."""

import numpy as np
import pytest

from super_gradients_tpu.training import dataloaders
from super_gradients_tpu.training.dataloaders import DataLoader, RandomClassificationDataset


class _SquareDataset:
    def __init__(self, n=64):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((4, 4, 3), i, dtype=np.float32), np.int32(i * i)


def _drain(loader):
    return [tuple(np.asarray(x) for x in b) for b in loader]


def test_worker_loader_matches_inline():
    ds = _SquareDataset(40)
    inline = DataLoader(ds, batch_size=8, shuffle=True, seed=3)
    workers = DataLoader(ds, batch_size=8, shuffle=True, seed=3, num_workers=2)
    try:
        a, b = _drain(inline), _drain(workers)
        assert len(a) == len(b) == 5
        for (xi, yi), (xw, yw) in zip(a, b):
            np.testing.assert_array_equal(xi, xw)
            np.testing.assert_array_equal(yi, yw)
        # a second epoch reuses the persistent pool and reshuffles
        inline.set_epoch(1), workers.set_epoch(1)
        a2, b2 = _drain(inline), _drain(workers)
        for (xi, yi), (xw, yw) in zip(a2, b2):
            np.testing.assert_array_equal(yi, yw)
        assert not np.array_equal(np.concatenate([y for _, y in a]), np.concatenate([y for _, y in a2]))
    finally:
        workers.close()


class _CrashDataset(_SquareDataset):
    def __getitem__(self, i):
        if i == 13:
            raise ValueError("boom on 13")
        return super().__getitem__(i)


def test_worker_crash_surfaces():
    loader = DataLoader(_CrashDataset(32), batch_size=8, num_workers=2)
    with pytest.raises(RuntimeError, match="boom on 13"):
        _drain(loader)


def test_get_honors_num_workers():
    loader = dataloaders.get("classification_test_dataloader",
                             dataloader_params={"batch_size": 8, "num_workers": 2, "prefetch_factor": 3})
    assert loader.num_workers == 2 and loader.prefetch_factor == 3
    try:
        batches = _drain(loader)
        assert len(batches) == 64 // 8 and batches[0][0].shape == (8, 64, 64, 3)
    finally:
        loader.close()


def test_early_break_does_not_corrupt_next_epoch():
    """Abandoning the iterator mid-epoch (max_train_batches / prefetch buffers)
    must not leak stale in-flight batches into the next epoch — regression for
    the generation-tag fix in _WorkerPool.run_epoch."""
    ds = _SquareDataset(96)
    loader = DataLoader(ds, batch_size=8, shuffle=True, seed=7, num_workers=3, prefetch_factor=4)
    try:
        it = iter(loader)
        next(it)  # many batches are now in flight; abandon the rest
        del it

        loader.set_epoch(1)
        got = _drain(loader)
        inline = DataLoader(ds, batch_size=8, shuffle=True, seed=7)
        inline.set_epoch(1)
        want = _drain(inline)
        assert len(got) == len(want) == 12
        for (xw, yw), (xi, yi) in zip(got, want):
            np.testing.assert_array_equal(yw, yi)
            np.testing.assert_array_equal(xw, xi)
    finally:
        loader.close()


def test_forkserver_default_start_method(monkeypatch):
    """Picklable datasets default to the forkserver start method (fork after JAX
    init is unsafe — the parent is multithreaded)."""
    monkeypatch.delenv("SG_WORKER_START_METHOD", raising=False)
    from super_gradients_tpu.training.dataloaders import _picklable

    assert _picklable(_SquareDataset(4))
    loader = DataLoader(_SquareDataset(16), batch_size=8, num_workers=1)
    try:
        assert len(_drain(loader)) == 2
    finally:
        loader.close()
