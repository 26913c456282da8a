"""HBM pipeline tests: device-resident gather + prefetch generator."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtraj.data.collate import WindowDataset
from mmtraj.data.pipeline import DeviceDataset, prefetch_to_device


def _ds(rng, n=20, n_max=6):
    windows = [rng.normal(size=(3, 20, 2)).astype(np.float32) for _ in range(n)]
    return WindowDataset(windows, n_max)


def test_device_dataset_gather_matches_host(rng):
    ds = _ds(rng)
    dds = DeviceDataset(ds)
    idx = np.array([3, 0, 7, 7])
    xy_d, mask_d = dds.batch(idx)
    xy_h, mask_h = ds.batch(idx)
    np.testing.assert_array_equal(np.asarray(xy_d), xy_h)
    np.testing.assert_array_equal(np.asarray(mask_d), mask_h)


def test_epoch_indices_cover_all_windows(rng):
    ds = _ds(rng, n=10)
    dds = DeviceDataset(ds)
    seen = np.concatenate(list(dds.epoch_indices(4, np.random.default_rng(0))))
    assert len(seen) == 12  # wrapped to full batches
    assert set(seen[:10].tolist()) | set(seen.tolist()) == set(range(10))


def test_prefetch_to_device_preserves_order_and_values(rng):
    batches = [
        {"x": rng.normal(size=(4, 3)).astype(np.float32), "i": np.array(i)}
        for i in range(7)
    ]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert int(b["i"]) == i
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_prefetch_empty_iterator():
    assert list(prefetch_to_device(iter([]))) == []
