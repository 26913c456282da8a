"""Checkpoint save/load: Orbax native + a flat-npz export/import shim.

BASELINE.json:5 requires "checkpoint formats match the reference"; the
reference was not mounted (SURVEY.md §0) so its exact format is unknowable
here.  Per SURVEY.md §5: Orbax is the native format, and the npz shim gives a
stable, dependency-free interchange format (flat '/'-joined keys) that an
import/export adapter can map onto the reference's layout once it is visible.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import numpy as np

from mmtraj.config import Config, DataConfig, ModelConfig, TrainConfig
from mmtraj.data.transforms import NormStats


class Checkpoint(NamedTuple):
    """A restored checkpoint.  opt_leaves is the flattened optimizer state
    (present only for resume-capable checkpoints); rebuild the pytree with
    jax.tree.unflatten against optimizer.init(params)'s structure."""

    params: Any
    stats: NormStats
    config: Config
    step: int
    opt_leaves: Optional[List[np.ndarray]]


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def config_to_json(cfg: Config) -> str:
    return json.dumps(dataclasses.asdict(cfg))


def config_from_json(s: str) -> Config:
    d = json.loads(s)
    return Config(
        model=ModelConfig(**d["model"]),
        data=DataConfig(**d["data"]),
        train=TrainConfig(**d["train"]),
    )


# -- npz shim (stable interchange format) -----------------------------------


def save_npz(
    path: str,
    params: Any,
    stats: NormStats,
    cfg: Config,
    step: int = 0,
    opt_state: Any = None,
) -> None:
    """Atomic write (tmp + rename) so a crash mid-save never corrupts the
    resume point (SURVEY.md §5: checkpoint-resume is the recovery story)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(params), "params/")
    flat["stats/mean"] = np.asarray(stats.mean)
    flat["stats/std"] = np.asarray(stats.std)
    flat["meta/step"] = np.asarray(step)
    flat["meta/config_json"] = np.frombuffer(
        config_to_json(cfg).encode("utf-8"), dtype=np.uint8
    )
    if opt_state is not None:
        for i, leaf in enumerate(jax.tree.leaves(jax.device_get(opt_state))):
            flat[f"opt/{i}"] = np.asarray(leaf)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path if path.endswith(".npz") else path + ".npz")


def load_npz(path: str) -> Checkpoint:
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        flat = {k: z[k] for k in z.files}
    cfg = config_from_json(bytes(flat.pop("meta/config_json")).decode("utf-8"))
    step = int(flat.pop("meta/step"))
    stats = NormStats(flat.pop("stats/mean"), flat.pop("stats/std"))
    opt_keys = sorted(
        (k for k in flat if k.startswith("opt/")), key=lambda k: int(k.split("/")[1])
    )
    opt_leaves = [flat.pop(k) for k in opt_keys] or None
    params = _unflatten(flat)["params"]
    params = jax.tree.map(lambda a: jax.numpy.asarray(a), params)
    return Checkpoint(params, stats, cfg, step, opt_leaves)


# -- Orbax native path -------------------------------------------------------


def save_orbax(path: str, params: Any, stats: NormStats, cfg: Config, step: int = 0) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tree = {
        "params": jax.device_get(params),
        "stats": {"mean": np.asarray(stats.mean), "std": np.asarray(stats.std)},
        "step": np.asarray(step),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    with open(os.path.join(path, "mmtraj_config.json"), "w") as f:
        f.write(config_to_json(cfg))


def load_orbax(path: str) -> Checkpoint:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    with open(os.path.join(path, "mmtraj_config.json")) as f:
        cfg = config_from_json(f.read())
    stats = NormStats(np.asarray(tree["stats"]["mean"]), np.asarray(tree["stats"]["std"]))
    return Checkpoint(tree["params"], stats, cfg, int(tree["step"]), None)


# -- format-sniffing front door ---------------------------------------------


def save(
    path: str, params: Any, stats: NormStats, cfg: Config, step: int = 0, opt_state: Any = None
) -> None:
    """Save a checkpoint; `.npz` suffix selects the shim, else Orbax."""
    if path.endswith(".npz"):
        save_npz(path, params, stats, cfg, step, opt_state)
    else:
        save_orbax(path, params, stats, cfg, step)


def load(path: str) -> Checkpoint:
    if path.endswith(".npz") or os.path.isfile(path + ".npz") or os.path.isfile(path):
        try:
            return load_npz(path)
        except Exception:
            pass
    return load_orbax(path)
