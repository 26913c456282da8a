"""Serve a frozen exported predictor: request -> K-sample rollout.

The last piece of the deployment story (export_predictor freezes checkpoint +
rollout into one StableHLO artifact; serve_bench measures it; this module
*runs* it).  `PredictServer` wraps the artifact and pads each request up to
the artifact's static (batch, n_agents) — shapes are baked in at export time
(TPU-native contract: one compiled program, no retraces) — then slices the
response back to the request's true size, so callers send exactly the windows
they have.  `serve_lines` is a JSON-lines loop over any byte streams (stdin/
stdout under `python -m mmtraj.cli serve`), one request per line:

    {"xy": [N][T_obs][2] or [B][N][T_obs][2], "mask": [N]|[B][N] (optional),
     "seed": int (optional), "encoding": "json"|"b64-npy" (optional)}
    -> {"pred": [K][B][N][T_pred][2], "k": K}   (B/N as sent; singleton batch
                                                 echoed without the B axis)

With ``"encoding": "b64-npy"`` the response carries the prediction as a
base64 .npy payload ({"pred_b64_npy": ..., "shape": [...], "k": K}) instead
of nested JSON lists — a batched K=20 response is ~10 MB of JSON text but
~1/4 that as binary, and np.load decodes it losslessly.

Malformed or out-of-capacity requests get {"error": ...} on their line and
the loop continues — a bad request must not take the replica down.

Reference counterpart: none — the reference ships research scripts with no
serving surface (SURVEY.md §5); this surface is the rebuild's own contract.
"""

from __future__ import annotations

import json
import sys
from typing import IO, Optional

import numpy as np


class PredictServer:
    """Wraps an exported predictor artifact; pads requests to its static
    shapes and slices responses back.

    Attributes (recovered from the artifact's in/out avals, not trusted from
    the caller): ``batch``, ``n_agents``, ``obs_len``, ``pred_len``, ``k``.
    """

    def __init__(self, artifact_path: str):
        from mmtraj.export import load_exported

        self._exported = load_exported(artifact_path)
        xy_aval = self._exported.in_avals[0]
        out_aval = self._exported.out_avals[0]
        self.batch, self.n_agents, self.obs_len = xy_aval.shape[:3]
        self.k, self.pred_len = out_aval.shape[0], out_aval.shape[3]

        import jax

        self._call = jax.jit(self._exported.call)

    def predict(self, xy: np.ndarray, mask: Optional[np.ndarray] = None,
                seed: int = 0) -> np.ndarray:
        """xy (B,N,obs_len,2) -> (K,B,N,pred_len,2); B/N may be anything up
        to the artifact's static capacity (padded agents return garbage the
        slice drops; padding never changes valid agents' outputs — the
        masking-invariance contract, tests/test_gat.py)."""
        import jax.numpy as jnp

        xy = np.asarray(xy, np.float32)
        if xy.ndim != 4 or xy.shape[-1] != 2:
            raise ValueError(f"xy must be (B,N,{self.obs_len},2), got {xy.shape}")
        b, n, t = xy.shape[:3]
        if t != self.obs_len:
            raise ValueError(f"obs_len mismatch: artifact expects "
                             f"{self.obs_len} steps, got {t}")
        if b > self.batch or n > self.n_agents:
            raise ValueError(f"request ({b},{n}) exceeds artifact capacity "
                             f"({self.batch},{self.n_agents}); re-export with "
                             f"a larger --batch / n_max")
        if mask is None:
            mask = np.ones((b, n), bool)
        mask = np.asarray(mask, bool)
        if mask.shape != (b, n):
            raise ValueError(f"mask shape {mask.shape} != ({b},{n})")

        xy_p = np.zeros((self.batch, self.n_agents, self.obs_len, 2), np.float32)
        xy_p[:b, :n] = xy
        mask_p = np.zeros((self.batch, self.n_agents), bool)
        mask_p[:b, :n] = mask
        out = self._call(jnp.asarray(xy_p), jnp.asarray(mask_p),
                         jnp.asarray(seed, jnp.int32))
        return np.asarray(out)[:, :b, :n]


def serve_lines(artifact_path: str, in_stream: IO[str], out_stream: IO[str],
                log_stream: IO[str] = sys.stderr) -> int:
    """JSON-lines request loop; returns the number of requests served OK."""
    server = PredictServer(artifact_path)
    print(f"serving {artifact_path}: capacity batch={server.batch} "
          f"n_agents={server.n_agents} obs_len={server.obs_len} "
          f"K={server.k}", file=log_stream, flush=True)
    ok = 0
    for line in in_stream:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            xy = np.asarray(req["xy"], np.float32)
            single = xy.ndim == 3  # [N][T][2]: echo back without a batch axis
            if single:
                xy = xy[None]
            mask = req.get("mask")
            if mask is not None:
                mask = np.asarray(mask, bool)
                if single:
                    mask = mask[None]
            pred = server.predict(xy, mask, int(req.get("seed", 0)))
            if single:
                pred = pred[:, 0]
            encoding = req.get("encoding", "json")
            if encoding == "b64-npy":
                import base64
                import io as _io

                buf = _io.BytesIO()
                np.save(buf, pred, allow_pickle=False)
                resp = {"pred_b64_npy": base64.b64encode(buf.getvalue()).decode(),
                        "shape": list(pred.shape), "k": server.k}
            elif encoding == "json":
                resp = {"pred": pred.tolist(), "k": server.k}
            else:
                raise ValueError(f"unknown encoding {encoding!r} "
                                 "(json | b64-npy)")
            ok += 1
        except Exception as e:  # noqa: BLE001 — a bad request must not kill the loop
            resp = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps(resp), file=out_stream, flush=True)
    return ok
