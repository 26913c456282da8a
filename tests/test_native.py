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


def test_native_malformed_first_line_is_valueerror(tmp_path):
    """A malformed FIRST line must not collide with the -1 I/O sentinel
    (the return code is -(line_no + 1)): ValueError 'line 1', not
    FileNotFoundError, matching the NumPy fallback exactly."""
    p = tmp_path / "badfirst.txt"
    p.write_text("0 1 oops\n0 1 2.0 3.0\n")
    with pytest.raises(ValueError, match="line 1"):
        read_annotation_file_native(str(p))
    with pytest.raises(ValueError, match="line 1"):
        read_annotation_file(str(p))


def test_glued_second_number_token_pinned(tmp_path):
    """'1.2.3'-style tokens: both paths keep the parsed prefix and stop the
    line's scan (token-level rule), instead of the native scanner restarting
    mid-token ('.3' as a new number)."""
    # Glued token in column 4 with 3 values before it: both accept [.., 4.5].
    ok = tmp_path / "glued_ok.txt"
    ok.write_text("1 2 3.0 4.5.6\n")
    a = read_annotation_file(str(ok))
    b = read_annotation_file_native(str(ok))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(a, [[1, 2, 3.0, 4.5]])
    # Glued token in column 1: both reject the line as <4 columns.
    bad = tmp_path / "glued_bad.txt"
    bad.write_text("1.2.3 4 5 6\n")
    with pytest.raises(ValueError, match="line 1"):
        read_annotation_file(str(bad))
    with pytest.raises(ValueError, match="line 1"):
        read_annotation_file_native(str(bad))


def test_bare_dot_token_pinned(tmp_path):
    """A lone '.' is not a number on either path (strtod rejects it; the
    fast-path mantissa accumulator must not read it as 0.0)."""
    p = tmp_path / "dot.txt"
    p.write_text("1 2 3.0 . 4.0\n")
    with pytest.raises(ValueError, match="line 1"):
        read_annotation_file(str(p))
    with pytest.raises(ValueError, match="line 1"):
        read_annotation_file_native(str(p))
