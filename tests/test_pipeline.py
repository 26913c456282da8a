"""HBM pipeline tests: device-resident gather + prefetch generator."""

import jax
import numpy as np

from mmtraj.data.collate import WindowDataset
from mmtraj.data.pipeline import DeviceDataset, prefetch_to_device
import pytest


pytestmark = pytest.mark.slow  # scan-heavy; quick subset: -m "not slow"


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


def test_fit_stream_matches_resident(synth_dir, tmp_path):
    """fit(stream=True) must follow the exact same loss trajectory as the
    HBM-resident path: same seed -> same permutation -> same batches, with
    the only difference being WHERE the batch is assembled (VERDICT r1 task
    7: the trainer's second ingest mode, exercised end-to-end)."""
    from mmtraj.config import Config, DataConfig, ModelConfig, TrainConfig
    from mmtraj.train import fit

    def run(stream):
        cfg = Config(
            model=ModelConfig(num_heads=1, social=True, head="gmm"),
            data=DataConfig(data_dir=synth_dir, scene="zara1", n_max=8),
            train=TrainConfig(
                batch_size=8, steps=12, log_every=1, eval_every=0,
                k_samples=1, out_dir="", stream=stream, seed=3,
            ),
        )
        return fit(cfg).history

    h_res = run(False)
    h_str = run(True)
    assert len(h_res) == len(h_str) == 12
    for (s_a, l_a), (s_b, l_b) in zip(h_res, h_str):
        assert s_a == s_b
        np.testing.assert_allclose(l_a, l_b, rtol=0, atol=0)


def test_fit_stream_multiple_prefetch_cycles(synth_dir):
    """A window set large enough to force many prefetch cycles (several
    epochs of batches through the double buffer) still trains and descends."""
    from mmtraj.config import Config, DataConfig, ModelConfig, TrainConfig
    from mmtraj.train import fit

    cfg = Config(
        model=ModelConfig(num_heads=1, social=False, head="deterministic", cell="gru"),
        data=DataConfig(data_dir=synth_dir, scene="zara1", n_max=8),
        train=TrainConfig(batch_size=4, steps=40, log_every=5, eval_every=0,
                          k_samples=1, out_dir="", stream=True, seed=0),
    )
    res = fit(cfg)
    losses = [l for _, l in res.history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_prefetch_abandoned_consumer_stops_producer():
    """Breaking out of the prefetch loop mid-stream (the trainer hitting its
    step budget mid-epoch) must release the producer thread instead of
    leaving it blocked on the slot semaphore forever."""
    import threading
    import time

    from mmtraj.data.pipeline import prefetch_to_device

    before = threading.active_count()
    batches = ({"x": np.full((4, 4), i, np.float32)} for i in range(100))
    it = prefetch_to_device(batches, size=2)
    next(it)
    next(it)
    it.close()  # what an abandoned `for` loop triggers via GC
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_epoch_indices_batch_larger_than_dataset(rng):
    """batch_size > n_windows still yields one FULL fixed-shape batch (the
    wrap pad repeats the permutation cyclically) — no recompiles, no
    under-sized shard under data parallelism."""
    ds = _ds(rng, n=5)
    dds = DeviceDataset(ds)
    batches = list(dds.epoch_indices(16, np.random.default_rng(0)))
    assert len(batches) == 1 and len(batches[0]) == 16
    assert set(batches[0].tolist()) == set(range(5))
    host = list(ds.epoch_batches(16, np.random.default_rng(0)))
    assert len(host) == 1 and host[0][0].shape[0] == 16


def test_prefetch_producer_exception_propagates():
    """A producer failure must raise in the consumer, not hang it forever."""
    def bad_iter():
        yield {"x": np.zeros(2, np.float32)}
        raise RuntimeError("synthetic ingest failure")

    gen = prefetch_to_device(bad_iter(), size=2)
    first = next(gen)
    assert isinstance(first["x"], jax.Array)
    with pytest.raises(RuntimeError, match="synthetic ingest failure"):
        list(gen)
