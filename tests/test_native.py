"""Native C++ parser: byte-identical to the NumPy parser + error paths."""

import numpy as np
import pytest

from mmtraj.data.native import (
    native_available,
    read_annotation_file_fast,
    read_annotation_file_native,
)
from mmtraj.data.parser import read_annotation_file

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_native_matches_numpy_on_synthetic(synth_dir):
    for scene in ("eth", "univ", "zara1"):
        path = f"{synth_dir}/{scene}.txt"
        a = read_annotation_file(path)
        b = read_annotation_file_native(path)
        np.testing.assert_array_equal(a, b)


def test_native_handles_comments_blanks_tabs(tmp_path):
    p = tmp_path / "messy.txt"
    p.write_text(
        "# header comment\n"
        "0\t1\t1.5\t-2.25\n"
        "\n"
        "10 2 3.0 4.0 99.0\n"  # extra trailing column ignored
        "   \n"
        "% other comment style\n"
        "20,  3,  5e-1,  -1e2\n"  # comma-separated tolerated
    )
    rows = read_annotation_file_native(str(p))
    expect = np.array(
        [[0, 1, 1.5, -2.25], [10, 2, 3.0, 4.0], [20, 3, 0.5, -100.0]]
    )
    np.testing.assert_allclose(rows, expect)


def test_native_missing_file():
    with pytest.raises(FileNotFoundError):
        read_annotation_file_native("/nonexistent/file.txt")


def test_native_malformed_line(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("0 1 2.0 3.0\n0 1 oops\n")
    with pytest.raises(ValueError, match="line 2"):
        read_annotation_file_native(str(p))


def test_fast_front_door(synth_dir):
    a = read_annotation_file_fast(f"{synth_dir}/hotel.txt")
    b = read_annotation_file(f"{synth_dir}/hotel.txt")
    np.testing.assert_array_equal(a, b)


def test_numpy_fallback_matches_native_on_messy(tmp_path):
    """The NumPy tolerant scanner mirrors the native parser's semantics on
    every messy construct the native path tolerates: '%' comments, commas,
    trailing junk tokens, junk glued to a number, extra columns."""
    p = tmp_path / "messy2.txt"
    p.write_text(
        "# header\n"
        "0\t1\t1.5\t-2.25\n"
        "10 2 3.0 4.0 99.0 extra_junk\n"
        "% matlab-style comment\n"
        "20,  3,  5e-1,  -1e2\n"
        "30 4 7.0 8.0junk\n"  # junk glued to the last number
        "\n"
    )
    a = read_annotation_file(str(p))
    b = read_annotation_file_native(str(p))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (4, 4)


def test_numpy_fallback_malformed_line_matches_native(tmp_path):
    p = tmp_path / "bad2.txt"
    p.write_text("% c\n0 1 2.0 3.0\n0, 1, oops\n")
    with pytest.raises(ValueError, match="line 3"):
        read_annotation_file(str(p))
    with pytest.raises(ValueError, match="line 3"):
        read_annotation_file_native(str(p))
