"""Checkpoint format sniffing + corruption handling.

Round-1 review: `load()` swallowed npz parse failures and fell through to
Orbax, so a corrupt .npz surfaced as a baffling Orbax error.  These tests pin
the fixed contract: every format failure raises CheckpointError naming the
file and format, with the real parse error chained as __cause__; suffix-less
files are dispatched by magic bytes, never by try-and-swallow.
"""

import os

import numpy as np
import pytest

from mmtraj import checkpoint as ck
from mmtraj.config import Config
from mmtraj.data.transforms import NormStats


@pytest.fixture()
def payload():
    params = {
        "enc": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "b": np.ones(3, np.float32),
    }
    stats = NormStats(np.zeros(2, np.float32), np.ones(2, np.float32))
    return params, stats, Config()


def _assert_params_equal(a, b):
    import jax

    flat_a, flat_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("name", ["c.npz", "c.pt", "c.h5"])
def test_roundtrip_by_suffix(tmp_path, payload, name):
    params, stats, cfg = payload
    p = str(tmp_path / name)
    ck.save(p, params, stats, cfg, step=7)
    restored = ck.load(p)
    _assert_params_equal(restored.params, params)
    assert restored.step == 7


@pytest.mark.parametrize("suffix", [".npz", ".pt", ".h5"])
def test_corrupt_file_raises_checkpoint_error(tmp_path, suffix):
    p = str(tmp_path / f"bad{suffix}")
    with open(p, "wb") as f:
        f.write(b"this is not a checkpoint at all" * 8)
    with pytest.raises(ck.CheckpointError) as ei:
        ck.load(p)
    # The error names the file, and the real parse failure is chained.
    assert "bad" + suffix in str(ei.value)
    assert ei.value.__cause__ is not None


def test_truncated_npz_raises_with_cause(tmp_path, payload):
    params, stats, cfg = payload
    p = str(tmp_path / "t.npz")
    ck.save(p, params, stats, cfg)
    raw = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(raw[: len(raw) // 2])
    with pytest.raises(ck.CheckpointError) as ei:
        ck.load(p)
    assert ".npz" in str(ei.value)
    assert ei.value.__cause__ is not None


def test_corrupt_orbax_dir_raises_checkpoint_error(tmp_path, payload):
    params, stats, cfg = payload
    p = str(tmp_path / "orb")
    ck.save(p, params, stats, cfg, step=3)
    # Wreck the metadata file Orbax needs.
    for root, _, files in os.walk(p):
        for fn in files:
            if fn.endswith(".json") and fn != "mmtraj_config.json":
                with open(os.path.join(root, fn), "w") as f:
                    f.write("{corrupt")
    # Either Orbax still limps through reading arrays, or it must fail as
    # CheckpointError — never as a raw orbax internal error.
    try:
        ck.load(p)
    except Exception as e:  # noqa: BLE001
        assert isinstance(e, ck.CheckpointError)


def test_suffixless_npz_sniffed_by_zip_magic(tmp_path, payload):
    params, stats, cfg = payload
    src = str(tmp_path / "c.npz")
    ck.save(src, params, stats, cfg, step=5)
    plain = str(tmp_path / "weights_final")
    os.rename(src, plain)
    restored = ck.load(plain)
    _assert_params_equal(restored.params, params)
    assert restored.step == 5


def test_suffixless_h5_sniffed_by_hdf_magic(tmp_path, payload):
    params, stats, cfg = payload
    src = str(tmp_path / "c.h5")
    ck.save(src, params, stats, cfg, step=9)
    plain = str(tmp_path / "model_keras")
    os.rename(src, plain)
    restored = ck.load(plain)
    _assert_params_equal(restored.params, params)
    assert restored.step == 9


def test_unknown_magic_is_actionable(tmp_path):
    p = str(tmp_path / "mystery")
    with open(p, "wb") as f:
        f.write(b"JUNKDATA")
    with pytest.raises(ck.CheckpointError, match="magic"):
        ck.load(p)


def test_missing_path_raises_checkpoint_error(tmp_path):
    with pytest.raises(ck.CheckpointError):
        ck.load(str(tmp_path / "does_not_exist"))


def test_save_opt_state_requires_npz(tmp_path, payload):
    """Interchange formats don't carry optimizer state; passing one must be
    a loud error, not a silently resume-broken checkpoint."""
    params, stats, cfg = payload
    fake_opt = {"mu": np.zeros(3, np.float32)}
    for name in ("c.pt", "c.h5", "orbax_dir"):
        with pytest.raises(ValueError, match="opt_state"):
            ck.save(str(tmp_path / name), params, stats, cfg, 0, opt_state=fake_opt)
    ck.save(str(tmp_path / "c.npz"), params, stats, cfg, 0, opt_state=fake_opt)
