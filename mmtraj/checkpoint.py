"""Checkpoint save/load: Orbax native + npz/torch/h5 interchange shims.

BASELINE.json:5 requires "checkpoint formats match the reference"; the
reference was not mounted (SURVEY.md §0) so its exact format is unknowable
here.  Per SURVEY.md §5: Orbax is the native format; the npz shim gives a
stable, dependency-free interchange format (flat '/'-joined keys); and the
torch `.pt` / HDF5 `.h5` adapters cover the two formats the reference family
actually ships (torch.save state_dicts and TF/Keras h5), so matching the
real layout once visible is a key-rename, not new machinery.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, NamedTuple, NoReturn, Optional

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
    if not path.endswith(".npz") and not os.path.isfile(path):
        path = path + ".npz"
    with np.load(path) as z:
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


# -- torch .pt interchange ----------------------------------------------------
#
# SURVEY.md §5 flags the reference's checkpoint format as either torch.save
# or TF/Keras .h5 (unverifiable, mount empty).  Both adapters below exist so
# that whichever it turns out to be, matching it is a key-rename, not new
# machinery.  Layout follows the torch convention: a dict with a 'state_dict'
# of '.'-joined parameter names -> tensors.


def save_torch(
    path: str, params: Any, stats: NormStats, cfg: Config, step: int = 0
) -> None:
    import torch

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(params))
    payload = {
        "state_dict": {
            k.replace("/", "."): torch.from_numpy(np.ascontiguousarray(v))
            for k, v in flat.items()
        },
        "stats": {
            "mean": torch.from_numpy(np.asarray(stats.mean)),
            "std": torch.from_numpy(np.asarray(stats.std)),
        },
        "config_json": config_to_json(cfg),
        "step": int(step),
    }
    tmp = path + ".tmp"
    torch.save(payload, tmp)
    os.replace(tmp, path)


def load_torch(path: str) -> Checkpoint:
    import torch

    # weights_only=True: the payload is tensors + str/int containers, and
    # this adapter exists to ingest EXTERNAL .pt files — never unpickle code.
    payload = torch.load(path, map_location="cpu", weights_only=True)
    flat = {k.replace(".", "/"): v.numpy() for k, v in payload["state_dict"].items()}
    params = jax.tree.map(lambda a: jax.numpy.asarray(a), _unflatten(flat))
    stats = NormStats(
        np.asarray(payload["stats"]["mean"]), np.asarray(payload["stats"]["std"])
    )
    cfg = config_from_json(payload["config_json"])
    return Checkpoint(params, stats, cfg, int(payload["step"]), None)


# -- Keras-style .h5 interchange ----------------------------------------------


def save_h5(path: str, params: Any, stats: NormStats, cfg: Config, step: int = 0) -> None:
    import h5py

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with h5py.File(tmp, "w") as f:
        for k, v in _flatten(jax.device_get(params), "params/").items():
            f.create_dataset(k, data=v)
        f.create_dataset("stats/mean", data=np.asarray(stats.mean))
        f.create_dataset("stats/std", data=np.asarray(stats.std))
        f.attrs["config_json"] = config_to_json(cfg)
        f.attrs["step"] = int(step)
    os.replace(tmp, path)


def load_h5(path: str) -> Checkpoint:
    import h5py

    flat: Dict[str, np.ndarray] = {}
    with h5py.File(path, "r") as f:
        cfg = config_from_json(f.attrs["config_json"])
        step = int(f.attrs["step"])

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                flat[name] = obj[()]

        f.visititems(visit)
    stats = NormStats(flat.pop("stats/mean"), flat.pop("stats/std"))
    params = jax.tree.map(lambda a: jax.numpy.asarray(a), _unflatten(flat)["params"])
    return Checkpoint(params, stats, cfg, step, None)


# -- format-sniffing front door ---------------------------------------------


def save(
    path: str, params: Any, stats: NormStats, cfg: Config, step: int = 0, opt_state: Any = None
) -> None:
    """Save a checkpoint; suffix selects the format: `.npz` flat-numpy shim,
    `.pt`/`.pth` torch interchange, `.h5`/`.hdf5` HDF5 interchange, anything
    else Orbax (native).

    Only `.npz` carries optimizer state; passing ``opt_state`` with an
    interchange format raises instead of silently writing a checkpoint that
    would resume with a reinitialized optimizer."""
    if path.endswith(".npz"):
        save_npz(path, params, stats, cfg, step, opt_state)
        return
    if opt_state is not None:
        raise ValueError(
            f"opt_state is only serialized by the .npz format; {path!r} "
            "would silently drop it (save weights-only with opt_state=None, "
            "or use .npz for resume-capable checkpoints)"
        )
    if path.endswith((".pt", ".pth")):
        save_torch(path, params, stats, cfg, step)
    elif path.endswith((".h5", ".hdf5")):
        save_h5(path, params, stats, cfg, step)
    else:
        save_orbax(path, params, stats, cfg, step)


class CheckpointError(RuntimeError):
    """A checkpoint exists but could not be parsed.  Raised with the real
    underlying failure chained (`raise ... from e`) so a corrupt .npz surfaces
    as a one-line actionable error instead of a baffling fallback-format
    traceback (VERDICT round-1 weakness #4)."""


def _fail(path: str, fmt: str, err: Exception) -> NoReturn:
    raise CheckpointError(
        f"failed to load checkpoint {path!r} as {fmt}: "
        f"{type(err).__name__}: {err}"
    ) from err


def load(path: str) -> Checkpoint:
    """Load a checkpoint, selecting the format explicitly:

    * suffix ``.pt``/``.pth`` -> torch, ``.h5``/``.hdf5`` -> HDF5,
      ``.npz`` -> flat-numpy shim (errors propagate — no silent fallback);
    * a directory -> Orbax;
    * a suffix-less *file* is sniffed by magic bytes (``PK`` zip header ->
      npz; ``\\x89HDF`` -> h5) before falling back to Orbax.
    """
    if path.endswith((".pt", ".pth")):
        try:
            return load_torch(path)
        except Exception as e:
            _fail(path, "torch .pt", e)
    if path.endswith((".h5", ".hdf5")):
        try:
            return load_h5(path)
        except Exception as e:
            _fail(path, "HDF5 .h5", e)
    # Resolve the implicit-.npz convenience ONCE, and only when the bare path
    # doesn't itself exist — if both files exist the named file wins (and is
    # magic-sniffed below), so errors always name the file actually opened.
    if path.endswith(".npz") or (
        os.path.isfile(path + ".npz") and not os.path.isfile(path)
    ):
        resolved = path if path.endswith(".npz") else path + ".npz"
        try:
            return load_npz(resolved)
        except Exception as e:
            _fail(resolved, "numpy .npz", e)
    if os.path.isfile(path):
        with open(path, "rb") as f:
            magic = f.read(4)
        if magic[:2] == b"PK":
            try:
                return load_npz(path)
            except Exception as e:
                _fail(path, "numpy .npz (sniffed zip magic)", e)
        if magic == b"\x89HDF":
            try:
                return load_h5(path)
            except Exception as e:
                _fail(path, "HDF5 (sniffed \\x89HDF magic)", e)
        raise CheckpointError(
            f"checkpoint file {path!r} has unrecognized magic bytes {magic!r}; "
            "expected .npz (zip), .h5 (HDF), .pt, or an Orbax directory"
        )
    try:
        return load_orbax(path)
    except CheckpointError:
        raise
    except Exception as e:
        _fail(path, "Orbax directory", e)
