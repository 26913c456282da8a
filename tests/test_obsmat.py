"""BIWI obsmat ingestion (mmtraj/data/obsmat.py): txt + .mat -> canonical rows
that flow through the parser/windower stack unchanged."""

import numpy as np
import pytest

from mmtraj.data.obsmat import convert_obsmat, read_obsmat


def _obsmat_rows(rng, n=40):
    """Synthesize 8-column obsmat rows [frame id x z y vx vz vy]."""
    frames = np.repeat(np.arange(10, 10 + n // 4) * 6, 4).astype(np.float64)[:n]
    ids = np.tile(np.arange(1, 5), n // 4).astype(np.float64)[:n]
    x = rng.normal(size=n) * 3
    y = rng.normal(size=n) * 3
    z = np.zeros(n)  # height axis, must be dropped
    v = rng.normal(size=(n, 3))
    return np.column_stack([frames, ids, x, z, y, v])


def test_read_obsmat_txt_column_mapping(tmp_path):
    rng = np.random.default_rng(0)
    raw = _obsmat_rows(rng)
    p = tmp_path / "obsmat.txt"
    np.savetxt(p, raw)
    out = read_obsmat(str(p))
    assert out.shape == (raw.shape[0], 4)
    np.testing.assert_allclose(out[:, 0], raw[:, 0])  # frame
    np.testing.assert_allclose(out[:, 1], raw[:, 1])  # ped id
    np.testing.assert_allclose(out[:, 2], raw[:, 2])  # pos_x
    np.testing.assert_allclose(out[:, 3], raw[:, 4])  # pos_y (NOT the z col)


def test_read_obsmat_mat(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")
    rng = np.random.default_rng(1)
    raw = _obsmat_rows(rng)
    p = tmp_path / "obsmat.mat"
    scipy_io.savemat(str(p), {"obsmat": raw})
    out = read_obsmat(str(p))
    np.testing.assert_allclose(out, raw[:, [0, 1, 2, 4]])


def test_read_obsmat_rejects_wrong_width(tmp_path):
    p = tmp_path / "bad.txt"
    np.savetxt(p, np.zeros((5, 4)))
    with pytest.raises(ValueError, match="8 obsmat columns"):
        read_obsmat(str(p))


def test_convert_obsmat_roundtrips_through_parser(tmp_path):
    """The converted file must load through the canonical annotation parser
    and produce windows — the real-data drop-in path, end to end."""
    from mmtraj.data.parser import read_annotation_file
    from mmtraj.data.windower import make_windows

    rng = np.random.default_rng(2)
    frames = np.repeat(np.arange(25) * 10, 2).astype(np.float64)
    ids = np.tile([1.0, 2.0], 25)
    x = np.linspace(0, 12, 50) + rng.normal(size=50) * 0.05
    y = np.linspace(0, 5, 50) + rng.normal(size=50) * 0.05
    raw = np.column_stack(
        [frames, ids, x, np.zeros(50), y, rng.normal(size=(50, 3))]
    )
    src = tmp_path / "obsmat.txt"
    dst = tmp_path / "eth.txt"
    np.savetxt(src, raw)
    n = convert_obsmat(str(src), str(dst))
    assert n == 50
    rows = read_annotation_file(str(dst))
    windows = make_windows(rows, obs_len=8, pred_len=12)
    assert windows and windows[0].shape == (2, 20, 2)
