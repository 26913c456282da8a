"""Packaging metadata stays consistent with the code it ships.

The wheel itself is exercised out-of-band (pip wheel + install to a scratch
target + end-to-end drive — see docs/API.md "Installing"); here we pin the
cheap invariants that would silently break it: the console-script target,
the shipped native source, and the package set.
"""

import os
import tomllib

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_script_target_resolves(pyproject):
    target = pyproject["project"]["scripts"]["mmtraj"]
    mod, _, attr = target.partition(":")
    import importlib

    fn = getattr(importlib.import_module(mod), attr)
    assert callable(fn)


def test_native_source_is_package_data(pyproject):
    data = pyproject["tool"]["setuptools"]["package-data"]["mmtraj.native"]
    assert "fastparse.cpp" in data
    assert os.path.exists(os.path.join(ROOT, "mmtraj", "native", "fastparse.cpp"))


def test_version_single_source(pyproject):
    import mmtraj

    assert pyproject["project"]["version"] == mmtraj.__version__


def test_all_packages_discoverable(pyproject):
    # setuptools find() with include=["mmtraj*"] picks up every dir with an
    # __init__.py; assert none of our subpackages is missing one (a missing
    # __init__.py would silently drop the subpackage from the wheel).
    for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, "mmtraj")):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        has_py = any(f.endswith(".py") for f in filenames)
        if has_py:
            assert "__init__.py" in filenames, f"{dirpath} lacks __init__.py"


@pytest.mark.slow
def test_wheel_builds_and_ships_everything(tmp_path):
    import subprocess
    import sys
    import zipfile
    import glob

    subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-build-isolation",
         "--no-index", "--no-deps", ROOT, "-w", str(tmp_path)],
        check=True, capture_output=True, text=True,
    )
    wheel = glob.glob(str(tmp_path / "mmtraj-*.whl"))[0]
    names = zipfile.ZipFile(wheel).namelist()
    assert "mmtraj/native/fastparse.cpp" in names
    # Every tracked source module ships.
    for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, "mmtraj")):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for f in filenames:
            if f.endswith(".py"):
                rel = os.path.relpath(os.path.join(dirpath, f), ROOT)
                assert rel in names, f"{rel} missing from wheel"
