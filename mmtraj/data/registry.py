"""Scene registry + 5-scene leave-one-out split (BASELINE.json:8).

Scenes: eth, hotel, univ, zara1, zara2.  Train on four, hold out the fifth
(SURVEY.md §2.1).  Files are looked up as ``{data_dir}/{scene}.txt`` or any
``{data_dir}/{scene}/*.txt`` so both flat dumps and per-scene directories work.
"""

from __future__ import annotations

import glob
import os
from typing import List, Tuple

import numpy as np

from mmtraj.config import SCENES
from mmtraj.data.native import read_annotation_file_fast as read_annotation_file
from mmtraj.data.windower import make_windows


def leave_one_out(test_scene: str) -> Tuple[List[str], List[str]]:
    if test_scene not in SCENES:
        raise KeyError(f"unknown scene {test_scene!r}; choose from {SCENES}")
    train = [s for s in SCENES if s != test_scene]
    return train, [test_scene]


def scene_files(data_dir: str, scene: str) -> List[str]:
    flat = os.path.join(data_dir, f"{scene}.txt")
    files = [flat] if os.path.exists(flat) else []
    files += sorted(glob.glob(os.path.join(data_dir, scene, "*.txt")))
    if not files:
        raise FileNotFoundError(
            f"no annotation files for scene {scene!r} under {data_dir!r} "
            f"(expected {scene}.txt or {scene}/*.txt); generate synthetic data "
            "with mmtraj.data.synthetic.write_synthetic_dataset"
        )
    return files


def load_scene_windows(
    data_dir: str, scene: str, obs_len: int, pred_len: int, stride: int = 1, min_agents: int = 1
) -> List[np.ndarray]:
    windows: List[np.ndarray] = []
    for path in scene_files(data_dir, scene):
        rows = read_annotation_file(path)
        windows += make_windows(rows, obs_len, pred_len, stride, min_agents)
    return windows


def load_split(
    data_dir: str, test_scene: str, obs_len: int, pred_len: int, stride: int = 1, min_agents: int = 1
):
    """Leave-one-out split -> (train_windows, test_windows)."""
    train_scenes, test_scenes = leave_one_out(test_scene)
    train = []
    for s in train_scenes:
        train += load_scene_windows(data_dir, s, obs_len, pred_len, stride, min_agents)
    test = []
    for s in test_scenes:
        test += load_scene_windows(data_dir, s, obs_len, pred_len, stride, min_agents)
    return train, test
