"""Ahead-of-time model export via jax.export (StableHLO serialization).

The serving/deployment story: `export_predictor` closes a trained checkpoint
over the K-sample rollout (weights baked in as constants), lowers it to
StableHLO for a chosen platform, and serializes it to a single file that any
jax.export-compatible runtime (or a later mmtraj version) can deserialize and
call WITHOUT the model code — `load_predictor` returns a plain callable
``(xy_obs, mask, key_seed) -> (K, B, N, Tp, 2)``.

The reference has no deployment surface (research scripts only, SURVEY.md);
this is the TPU-native equivalent of shipping a frozen inference graph.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def make_predictor(model, params, stats, k: int, oversample: int = 1) -> Callable:
    """Pure inference fn with weights/stats closed over:
    (xy_obs (B,N,To,2) f32, mask (B,N) bool, seed ()->i32) -> (K,B,N,Tp,2).

    ``oversample > 1`` bakes sample-and-select into the frozen graph: the
    exported artifact draws R=oversample*k rollouts and returns the k most
    endpoint-diverse per agent (measured −4% ADE / −13% FDE at R=3,
    RESULTS.md) — the deployment default when quality beats raw throughput."""

    def predict(xy_obs, mask, seed):
        key = jax.random.PRNGKey(seed)
        preds = model.rollout_k(params, xy_obs, mask, stats, key, k * oversample)
        if oversample > 1:
            from mmtraj.models.sampling import diverse_select

            preds = diverse_select(preds, k)
        return preds

    return predict


def export_predictor(
    path: str,
    model,
    params,
    stats,
    *,
    k: int = 20,
    batch: int = 64,
    n_agents: Optional[int] = None,
    platform: Optional[str] = None,
    oversample: int = 1,
) -> None:
    """Serialize the frozen K-sample predictor as StableHLO.

    Shapes are static (TPU-native contract: fixed padded shapes); ``platform``
    defaults to the current backend ('tpu' on the chip, 'cpu' in tests).
    ``oversample`` bakes sample-and-select in (see make_predictor).
    """
    import jax.export as je

    n = n_agents if n_agents is not None else 0
    if n <= 0:
        raise ValueError("n_agents is required (padded agent capacity)")
    plat = platform or jax.default_backend()
    if plat != "tpu" and (
        model.cfg.use_pallas or model.cfg.use_fused_decoder
        or model.cfg.attend_kernel == "pallas"
    ):
        raise ValueError(
            f"cannot export for platform {plat!r}: the model config pins "
            "TPU-only Pallas kernels (use_pallas / use_fused_decoder / "
            "attend_kernel='pallas') — export with the XLA-path config"
        )
    if model.cfg.attend_kernel == "auto":
        # Resolve the auto attend dispatch STATICALLY for the export TARGET:
        # the runtime rule keys on the session backend at trace time
        # (gat._use_attend_kernel), which may differ from ``plat`` in either
        # direction — a TPU session exporting for CPU would embed a Mosaic
        # custom call the target can't run, and a CPU session exporting for
        # TPU would silently lose the dense-N kernel win (2.3-2.6x at
        # N>=128).  Same rule as the runtime's, on an inference path.
        import dataclasses

        from mmtraj.models.forecaster import Forecaster

        want = "pallas" if (plat == "tpu" and n >= 128) else "xla"
        model = Forecaster(
            dataclasses.replace(model.cfg, attend_kernel=want),
            model.obs_len, model.pred_len,
        )
    predict = make_predictor(model, params, stats, k, oversample)
    args = (
        jax.ShapeDtypeStruct((batch, n, model.obs_len, 2), jnp.float32),
        jax.ShapeDtypeStruct((batch, n), jnp.bool_),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    exported = je.export(jax.jit(predict), platforms=[plat])(*args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_exported(path: str):
    """Deserialize the raw jax.export object (exposes in_avals/out_avals,
    so callers can recover the artifact's static shapes — see mmtraj.serve)."""
    import jax.export as je

    with open(path, "rb") as f:
        return je.deserialize(f.read())


def load_predictor(path: str) -> Callable:
    """Deserialize an exported predictor into a callable (jit-wrapped)."""
    exported = load_exported(path)
    call = exported.call

    def predict(xy_obs, mask, seed):
        return call(
            jnp.asarray(xy_obs, jnp.float32),
            jnp.asarray(mask, bool),
            jnp.asarray(seed, jnp.int32),
        )

    return jax.jit(predict)
