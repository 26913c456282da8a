"""Reference-checkpoint import/export shim (torch-convention state_dicts).

BASELINE.json:5 requires "checkpoint formats match the reference", but the
reference mount was empty (SURVEY.md §0), so its exact layer names are
unknowable here.  This module makes the PARITY.md "key-rename" mitigation a
*demonstrated* capability instead of an assertion: it maps a torch-convention
``state_dict`` — ``encoder.rnn.weight_ih_l0``-style names, ``(out, in)``
Linear weights, torch GRU/LSTM gate packing — onto mmtraj params exactly
(bit-for-bit forward-pass parity vs ``torch.nn.GRUCell``/``LSTMCell`` is
pinned in tests/test_import_shim.py).  When the real reference appears, its
layout slots in by editing KEY conventions below, not by new machinery.

Semantics handled beyond renaming (each is a silent-wrongness trap):

* torch Linear stores ``weight`` as (out, in); mmtraj dense is (in, out).
* torch GRU packs gates as (r, z, n); mmtraj packs (z, r, n).
* torch keeps separate input/recurrent biases; the recurrent n-gate bias
  lives INSIDE the reset multiplication, so it cannot be folded into a single
  bias — imports carry it as the optional cell param ``bh``
  (mmtraj/models/cells.py).
* mmtraj's LSTM adds the +1 forget-gate bias in the activation; torch bakes
  it into the trained bias, so import subtracts 1 from the f rows (and export
  adds it back).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from mmtraj.config import ModelConfig
from mmtraj.models.layers import Params


def _t(w) -> np.ndarray:
    """torch Linear (out, in) -> mmtraj dense (in, out)."""
    return np.ascontiguousarray(np.asarray(w, dtype=np.float32).T)


def _gru_w(w_torch) -> np.ndarray:
    """torch GRU weight (3H, din) rows (r, z, n) -> (din, 3H) cols (z, r, n)."""
    r, z, n = np.split(np.asarray(w_torch, dtype=np.float32), 3, axis=0)
    return np.concatenate([z.T, r.T, n.T], axis=1)


def _gru_b(b_torch) -> np.ndarray:
    r, z, n = np.split(np.asarray(b_torch, dtype=np.float32), 3)
    return np.concatenate([z, r, n])


def _lstm_w(w_torch) -> np.ndarray:
    """torch LSTM gate order (i, f, g, o) matches mmtraj; transpose only."""
    return _t(w_torch)


def _lstm_b(b_torch, forget_shift: float) -> np.ndarray:
    b = np.asarray(b_torch, dtype=np.float32).copy()
    H = b.shape[0] // 4
    b[H : 2 * H] += forget_shift
    return b


def _cell_from_torch(sd: Dict[str, Any], prefix: str, kind: str) -> Params:
    w_ih, w_hh = sd[f"{prefix}.weight_ih_l0"], sd[f"{prefix}.weight_hh_l0"]
    b_ih, b_hh = sd[f"{prefix}.bias_ih_l0"], sd[f"{prefix}.bias_hh_l0"]
    if kind == "gru":
        return {
            "wx": _gru_w(w_ih),
            "wh": _gru_w(w_hh),
            "b": _gru_b(b_ih),
            "bh": _gru_b(b_hh),
        }
    return {
        "wx": _lstm_w(w_ih),
        "wh": _lstm_w(w_hh),
        # mmtraj applies sigmoid(f + 1.0); torch's trained bias already
        # contains its full forget bias -> shift input bias down by 1.
        "b": _lstm_b(b_ih, -1.0),
        "bh": np.asarray(b_hh, dtype=np.float32),
    }


def _cell_to_torch(p: Params, prefix: str, kind: str, out: Dict[str, np.ndarray]) -> None:
    def gru_inv_w(w):  # (din, 3H) cols (z, r, n) -> (3H, din) rows (r, z, n)
        H = w.shape[1] // 3
        z, r, n = w[:, :H], w[:, H : 2 * H], w[:, 2 * H :]
        return np.concatenate([r.T, z.T, n.T], axis=0)

    def gru_inv_b(b):
        H = b.shape[0] // 3
        return np.concatenate([b[H : 2 * H], b[:H], b[2 * H :]])

    wx = np.asarray(p["wx"], dtype=np.float32)
    wh = np.asarray(p["wh"], dtype=np.float32)
    b = np.asarray(p["b"], dtype=np.float32)
    bh = np.asarray(p.get("bh", np.zeros_like(b)), dtype=np.float32)
    if kind == "gru":
        out[f"{prefix}.weight_ih_l0"] = gru_inv_w(wx)
        out[f"{prefix}.weight_hh_l0"] = gru_inv_w(wh)
        out[f"{prefix}.bias_ih_l0"] = gru_inv_b(b)
        out[f"{prefix}.bias_hh_l0"] = gru_inv_b(bh)
    else:
        out[f"{prefix}.weight_ih_l0"] = wx.T
        out[f"{prefix}.weight_hh_l0"] = wh.T
        out[f"{prefix}.bias_ih_l0"] = _lstm_b(b, +1.0)
        out[f"{prefix}.bias_hh_l0"] = bh


def _gat_from_torch(sd: Dict[str, Any], prefix: str) -> Params:
    return {
        "wv": _t(sd[f"{prefix}.value.weight"]),
        "a_src": np.asarray(sd[f"{prefix}.attn_src"], dtype=np.float32),
        "a_dst": np.asarray(sd[f"{prefix}.attn_dst"], dtype=np.float32),
        "wo": _t(sd[f"{prefix}.out_proj.weight"]),
        "bo": np.asarray(sd[f"{prefix}.out_proj.bias"], dtype=np.float32),
    }


def _gat_to_torch(p: Params, prefix: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.value.weight"] = np.asarray(p["wv"], dtype=np.float32).T
    out[f"{prefix}.attn_src"] = np.asarray(p["a_src"], dtype=np.float32)
    out[f"{prefix}.attn_dst"] = np.asarray(p["a_dst"], dtype=np.float32)
    out[f"{prefix}.out_proj.weight"] = np.asarray(p["wo"], dtype=np.float32).T
    out[f"{prefix}.out_proj.bias"] = np.asarray(p["bo"], dtype=np.float32)


def import_state_dict(sd: Dict[str, Any], cfg: ModelConfig) -> Params:
    """Torch-convention state_dict -> mmtraj params (init_params structure).

    Accepts torch tensors or numpy arrays as values.  Raises KeyError naming
    the first missing reference key, so a convention mismatch is a one-line
    diagnosis.
    """
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
    params: Params = {
        "enc": {
            "embed": {"w": _t(sd["encoder.embedding.weight"]),
                      "b": np.asarray(sd["encoder.embedding.bias"], np.float32)},
            "cell": _cell_from_torch(sd, "encoder.rnn", cfg.cell),
        },
        "dec": {
            "embed": {"w": _t(sd["decoder.embedding.weight"]),
                      "b": np.asarray(sd["decoder.embedding.bias"], np.float32)},
            "cell": _cell_from_torch(sd, "decoder.rnn", cfg.cell),
        },
        "bridge_h": {"w": _t(sd["bridge_h.weight"]),
                     "b": np.asarray(sd["bridge_h.bias"], np.float32)},
    }
    if cfg.cell == "lstm":
        params["bridge_c"] = {"w": _t(sd["bridge_c.weight"]),
                              "b": np.asarray(sd["bridge_c.bias"], np.float32)}
    if cfg.social:
        params["enc"]["gat"] = _gat_from_torch(sd, "encoder.gat")
        params["dec"]["gat"] = _gat_from_torch(sd, "decoder.gat")
    params["head"] = {"w": _t(sd["head.weight"]),
                      "b": np.asarray(sd["head.bias"], np.float32)}
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params)


def export_state_dict(params: Params, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Inverse of import_state_dict (used to write reference-convention
    checkpoints and to fabricate test fixtures)."""
    import jax

    params = jax.device_get(params)
    out: Dict[str, np.ndarray] = {
        "encoder.embedding.weight": np.asarray(params["enc"]["embed"]["w"], np.float32).T,
        "encoder.embedding.bias": np.asarray(params["enc"]["embed"]["b"], np.float32),
        "decoder.embedding.weight": np.asarray(params["dec"]["embed"]["w"], np.float32).T,
        "decoder.embedding.bias": np.asarray(params["dec"]["embed"]["b"], np.float32),
        "bridge_h.weight": np.asarray(params["bridge_h"]["w"], np.float32).T,
        "bridge_h.bias": np.asarray(params["bridge_h"]["b"], np.float32),
        "head.weight": np.asarray(params["head"]["w"], np.float32).T,
        "head.bias": np.asarray(params["head"]["b"], np.float32),
    }
    _cell_to_torch(params["enc"]["cell"], "encoder.rnn", cfg.cell, out)
    _cell_to_torch(params["dec"]["cell"], "decoder.rnn", cfg.cell, out)
    if cfg.cell == "lstm":
        out["bridge_c.weight"] = np.asarray(params["bridge_c"]["w"], np.float32).T
        out["bridge_c.bias"] = np.asarray(params["bridge_c"]["b"], np.float32)
    if cfg.social:
        _gat_to_torch(params["enc"]["gat"], "encoder.gat", out)
        _gat_to_torch(params["dec"]["gat"], "decoder.gat", out)
    return out


def import_reference_checkpoint(path: str, cfg: ModelConfig) -> Params:
    """Load a reference-convention torch ``.pt`` and return mmtraj params.

    The file may be a bare state_dict or a dict with a ``state_dict`` entry
    (both torch.save conventions)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    sd = payload.get("state_dict", payload) if isinstance(payload, dict) else payload
    return import_state_dict(sd, cfg)
