"""UCY .vsp spline ingestion (mmtraj/data/vsp.py; VERDICT r2 missing #4)."""

import numpy as np
import pytest

from mmtraj.data.vsp import (apply_homography, convert_vsp, interpolate_track,
                             parse_vsp)


def _write_vsp(path, peds):
    """peds: list of (n, 3) [x, y, frame] control-point arrays."""
    lines = [f"{len(peds)} - the number of splines"]
    for pts in peds:
        lines.append(f"{len(pts)} - Num of control points")
        for x, y, f in pts:
            lines.append(f"{x:.1f} {y:.1f} {int(f)} 0.0")
    path.write_text("\n".join(lines) + "\n")


def test_parse_vsp_roundtrip(tmp_path):
    peds = [
        np.array([[10.0, 20.0, 0], [50.0, 60.0, 40]]),
        np.array([[-5.0, 0.0, 100], [-5.0, 30.0, 120], [25.0, 30.0, 160]]),
    ]
    p = tmp_path / "scene.vsp"
    _write_vsp(p, peds)
    out = parse_vsp(str(p))
    assert len(out) == 2
    np.testing.assert_allclose(out[0], peds[0])
    np.testing.assert_allclose(out[1], peds[1])


def test_parse_vsp_truncated_raises(tmp_path):
    p = tmp_path / "bad.vsp"
    p.write_text("1 - splines\n3 - points\n0 0 0 0\n1 1 10 0\n")
    with pytest.raises(ValueError, match="truncated"):
        parse_vsp(str(p))


def test_interpolate_track_linear_on_grid():
    # Control points at frames 5 and 45; grid 10..40 inclusive.
    pts = np.array([[0.0, 0.0, 5], [40.0, 80.0, 45]])
    out = interpolate_track(pts, frame_step=10)
    np.testing.assert_allclose(out[:, 2], [10, 20, 30, 40])
    # Linear in frame time: x = frame - 5, y = 2 * (frame - 5).
    np.testing.assert_allclose(out[:, 0], out[:, 2] - 5)
    np.testing.assert_allclose(out[:, 1], 2 * (out[:, 2] - 5))


def test_interpolate_unsorted_control_points():
    pts = np.array([[40.0, 0.0, 45], [0.0, 0.0, 5]])  # drawing order, not time
    out = interpolate_track(pts, frame_step=10)
    assert (np.diff(out[:, 2]) > 0).all()
    np.testing.assert_allclose(out[:, 0], out[:, 2] - 5)


def test_apply_homography_projective():
    # Pure scale+translate H first.
    H = np.array([[0.05, 0, 1.0], [0, -0.05, 2.0], [0, 0, 1.0]])
    xy = np.array([[100.0, 200.0]])
    np.testing.assert_allclose(apply_homography(H, xy), [[6.0, -8.0]])
    # A genuinely projective H (nonzero bottom row) divides by w.
    Hp = np.array([[1.0, 0, 0], [0, 1.0, 0], [0.01, 0, 1.0]])
    np.testing.assert_allclose(apply_homography(Hp, xy), [[50.0, 100.0]])
    with pytest.raises(ValueError, match="3x3"):
        apply_homography(np.eye(2), xy)


def test_convert_vsp_feeds_the_standard_stack(tmp_path):
    """convert -> canonical txt -> parser/windower round trip, with meters
    matching the homography-mapped control points."""
    from mmtraj.data.parser import read_annotation_file

    peds = [
        np.array([[0.0, 0.0, 0], [200.0, 0.0, 200]]),
        np.array([[0.0, 100.0, 0], [200.0, 100.0, 200]]),
    ]
    src = tmp_path / "zara9.vsp"
    _write_vsp(src, peds)
    dst = tmp_path / "zara9.txt"
    H = np.array([[0.02, 0, 0], [0, 0.02, 0], [0, 0, 1.0]])
    n = convert_vsp(str(src), str(dst), homography=H)
    assert n == 2 * 21  # frames 0..200 step 10, two peds
    rows = read_annotation_file(str(dst))
    assert set(np.unique(rows[:, 1])) == {0.0, 1.0}
    ped0 = rows[rows[:, 1] == 0]
    # x advances 0.02 m per pixel * 1 px per frame * 10 frames = 0.2 m/step
    np.testing.assert_allclose(np.diff(ped0[:, 2]), 0.2, atol=1e-6)
    np.testing.assert_allclose(ped0[:, 3], 0.0, atol=1e-9)

    with pytest.raises(ValueError, match="exactly one"):
        convert_vsp(str(src), str(dst))
    # Scale fallback matches a diagonal homography exactly.
    dst2 = tmp_path / "zara9b.txt"
    convert_vsp(str(src), str(dst2), scale=0.02)
    np.testing.assert_allclose(read_annotation_file(str(dst2)), rows)


def test_convert_vsp_all_tracks_below_grid_writes_empty(tmp_path):
    """Every spline spanning fewer frames than the grid step yields 0 rows
    and a valid (empty) file, not an IndexError on a (0,)-shaped array."""
    peds = [np.array([[0.0, 0.0, 3], [5.0, 5.0, 7]])]  # frames 3..7 < step 10
    src = tmp_path / "short.vsp"
    _write_vsp(src, peds)
    dst = tmp_path / "short.txt"
    n = convert_vsp(str(src), str(dst), scale=0.02)
    assert n == 0
    assert dst.exists() and dst.read_text().strip() == ""


def test_parse_vsp_short_data_row_raises_valueerror(tmp_path):
    """A control-point row missing the frame column raises a ValueError
    naming the file/row, not a bare IndexError."""
    p = tmp_path / "shortrow.vsp"
    p.write_text("1 - splines\n2 - points\n0.0 0.0 0 0.0\n1.0 1.0\n")
    with pytest.raises(ValueError, match="malformed control-point row"):
        parse_vsp(str(p))
