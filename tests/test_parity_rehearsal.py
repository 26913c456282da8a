"""Parity-day dress rehearsal as one motion (VERDICT r3 next-round #4).

tools/parity_rehearsal.py chains every hop a real ETH/UCY + reference
drop-in would take — raw obsmat/vsp fixtures -> import CLIs -> round-trip
equality -> train -> eval -> torch/Keras checkpoint round trips -> StableHLO
export -> one served request — with an assertion at each hop.  This test
runs the same chain on the CPU mesh so the rehearsal itself can't rot.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
import parity_rehearsal  # noqa: E402

pytestmark = pytest.mark.slow  # trains + exports; quick subset: -m "not slow"


def test_rehearsal_all_hops(tmp_path):
    evidence = parity_rehearsal.rehearse(
        str(tmp_path), steps=40, k=4, n_frames=120, verbose=False)
    assert set(evidence) == {"import", "eval", "convert", "serve"}
