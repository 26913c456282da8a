"""Data layer tests: parser, windower, transforms, collate, registry.

SURVEY.md §4 unit-test list: transform round-trips, full-presence windowing,
fixed-shape padding.
"""

import numpy as np
import pytest

from mmtraj.data.collate import WindowDataset, pad_windows
from mmtraj.data.parser import read_annotation_file, scene_arrays
from mmtraj.data.registry import leave_one_out, load_scene_windows, load_split
from mmtraj.data.transforms import (
    compute_norm_stats,
    denormalize,
    integrate,
    normalize,
    to_relative,
)
from mmtraj.data.windower import make_windows


def test_parser_reads_synthetic(synth_dir):
    rows = read_annotation_file(f"{synth_dir}/zara1.txt")
    assert rows.shape[1] == 4 and rows.shape[0] > 100
    # frame ids advance in steps of 10 like the real dumps
    frames = np.unique(rows[:, 0])
    assert np.all(np.diff(frames) == 10)


def test_scene_arrays_roundtrip():
    rows = np.array(
        [[0, 1, 1.0, 2.0], [0, 2, 3.0, 4.0], [10, 1, 1.5, 2.5]], dtype=np.float64
    )
    pos, pres, frames, peds = scene_arrays(rows)
    assert pos.shape == (2, 2, 2) and pres.shape == (2, 2)
    assert pres[0].all()  # ped 1 present both frames
    assert pres[1, 0] and not pres[1, 1]
    np.testing.assert_allclose(pos[0, 1], [1.5, 2.5])


def test_windower_full_presence():
    # ped 1 present frames 0..19 (full), ped 2 only 0..9 -> excluded.
    rows = []
    for f in range(20):
        rows.append([f * 10, 1, float(f), 0.0])
        if f < 10:
            rows.append([f * 10, 2, 0.0, float(f)])
    windows = make_windows(np.array(rows), obs_len=8, pred_len=12)
    assert len(windows) == 1
    assert windows[0].shape == (1, 20, 2)
    np.testing.assert_allclose(windows[0][0, :, 0], np.arange(20, dtype=np.float32))


def test_windower_stride_and_counts(synth_dir):
    rows = read_annotation_file(f"{synth_dir}/univ.txt")
    w1 = make_windows(rows, 8, 12, stride=1)
    w5 = make_windows(rows, 8, 12, stride=5)
    assert len(w1) > len(w5) > 0
    assert all(w.shape[1:] == (20, 2) for w in w1)


def test_relative_integrate_roundtrip(rng):
    xy = rng.normal(size=(3, 5, 20, 2)).astype(np.float32)
    dxy = to_relative(xy)
    assert dxy.shape == xy.shape
    np.testing.assert_allclose(dxy[..., 0, :], 0.0)
    # integrate the future part back from the anchor
    rebuilt = integrate(xy[..., 7, :], np.diff(xy, axis=-2)[..., 7:, :])
    np.testing.assert_allclose(rebuilt, xy[..., 8:, :], atol=1e-5)


def test_normalize_roundtrip(rng):
    windows = [rng.normal(size=(4, 20, 2)).astype(np.float32) for _ in range(10)]
    stats = compute_norm_stats(windows, obs_len=8)
    d = rng.normal(size=(7, 2)).astype(np.float32)
    np.testing.assert_allclose(denormalize(normalize(d, stats), stats), d, atol=1e-5)


def test_pad_windows_shapes_and_overflow():
    w_small = np.zeros((3, 20, 2), np.float32)
    w_big = np.arange(10 * 20 * 2, dtype=np.float32).reshape(10, 20, 2)
    xy, mask, dropped = pad_windows([w_small, w_big], n_max=8)
    assert xy.shape == (2, 8, 20, 2) and mask.shape == (2, 8)
    assert mask[0].sum() == 3 and mask[1].sum() == 8
    assert dropped == 2


def test_dataset_epoch_batches(synth_dir):
    windows = load_scene_windows(synth_dir, "zara1", 8, 12)
    ds = WindowDataset(windows, n_max=24)
    batches = list(ds.epoch_batches(4, np.random.default_rng(0)))
    assert all(b[0].shape == (4, 24, 20, 2) for b in batches)
    assert len(batches) == -(-len(ds) // 4)


def test_leave_one_out():
    train, test = leave_one_out("univ")
    assert test == ["univ"] and "univ" not in train and len(train) == 4
    with pytest.raises(KeyError):
        leave_one_out("nope")


def test_load_split(synth_dir):
    train, test = load_split(synth_dir, "hotel", 8, 12, stride=4)
    assert len(train) > 0 and len(test) > 0


def test_parser_tolerates_blank_lines_and_mixed_whitespace(tmp_path):
    """Real annotation files have trailing newlines / mixed separators; the
    NumPy and native C++ parsers must agree on them."""
    from mmtraj.data.parser import read_annotation_file
    from mmtraj.data.native import read_annotation_file_native

    p = str(tmp_path / "messy.txt")
    open(p, "w").write(
        "0.0\t1.0\t1.5\t2.5\n\n10.0\t1.0\t1.6\t2.6\n   \n20.0 2.0 3.0 4.0\n"
    )
    a = read_annotation_file(p)
    assert a.shape == (3, 4)
    b = read_annotation_file_native(p)
    if b is not None:  # native lib unavailable -> front door falls back
        np.testing.assert_array_equal(a, b)
