"""Reference-checkpoint import/export shims (torch AND Keras conventions).

BASELINE.json:5 requires "checkpoint formats match the reference", but the
reference mount was empty (SURVEY.md §0), so its exact layer names are
unknowable here.  This module makes the PARITY.md "key-rename" mitigation a
*demonstrated* capability for BOTH candidate frameworks instead of an
assertion: it maps a torch-convention ``state_dict``
(``encoder.rnn.weight_ih_l0``-style names, ``(out, in)`` Linear weights,
torch GRU/LSTM gate packing) and a Keras-convention weight set
(``kernel``/``recurrent_kernel`` split, (z, r, h) GRU gate order,
``reset_after`` dual bias, legacy ``save_weights`` .h5 layout) onto mmtraj
params exactly — forward-pass parity vs real ``torch.nn`` and real
``keras.layers`` cells is pinned in tests/test_import_shim.py.  When the real
reference appears, its layout slots in by editing KEY conventions below, not
by new machinery.

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


def _require_rnn_encoder(cfg: ModelConfig, what: str) -> None:
    """Reference-convention import/export maps the RNN encoder family only —
    the attention encoder (cfg.encoder='attn') is mmtraj's own extension with
    no torch/Keras reference layout to mirror; its checkpoints travel via
    mmtraj's native formats (orbax/.npz)."""
    if getattr(cfg, "encoder", "rnn") != "rnn":
        raise ValueError(
            f"{what} covers the reference RNN encoder family only; "
            f"cfg.encoder={cfg.encoder!r} has no reference convention to map "
            "(use the orbax/.npz native formats for attention-encoder models)"
        )


def import_state_dict(sd: Dict[str, Any], cfg: ModelConfig) -> Params:
    """Torch-convention state_dict -> mmtraj params (init_params structure).

    Accepts torch tensors or numpy arrays as values.  Raises KeyError naming
    the first missing reference key, so a convention mismatch is a one-line
    diagnosis.
    """
    _require_rnn_encoder(cfg, "import_state_dict")
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
    _require_rnn_encoder(cfg, "export_state_dict")
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


# -- Keras-convention import/export (TF/Keras-era reference family) ----------
#
# SURVEY.md's own reconstruction says the reference is TensorFlow/Keras-era
# ("What the reference IS" [K]; §5 names "TF/Keras .h5 vs torch" the top
# thing to check).  This section makes the Keras half of the key-rename claim
# as *demonstrated* as the torch half: exact cell semantics pinned against
# real ``keras.layers.GRUCell``/``LSTMCell`` (tests/test_import_shim.py) and
# a reader/writer for the legacy ``save_weights`` HDF5 layout.
#
# Semantics handled beyond renaming:
#
# * Keras GRU packs gates as (z, r, h) — the SAME column order as mmtraj, and
#   ``kernel``/``recurrent_kernel`` are already (in, out): no transposes.
# * ``reset_after=True`` (the TF2-era default, CuDNN-compatible) keeps TWO
#   bias rows (2, 3H): input bias + recurrent bias, the recurrent candidate
#   bias living inside the reset multiplication — exactly mmtraj's optional
#   ``bh`` (same mechanism the torch import uses).
# * ``reset_after=False`` (Keras-1-era) multiplies the reset gate into the
#   HIDDEN STATE before the candidate matmul: n = tanh(Wn x + b + (r*h) Un).
#   That is a different function — imports carry the candidate recurrent
#   matrix separately as ``wh_n`` (mmtraj/models/cells.py takes the
#   reset-before path when present).
# * Keras LSTM packs (i, f, c, o) = mmtraj's (i, f, g, o); single fused bias.
#   ``unit_forget_bias=True`` bakes the +1 into the trained bias, mmtraj adds
#   it in the activation -> import shifts the f rows by -1 (export: +1).

#: mmtraj module path -> Keras-convention layer name (legacy save_weights
#: layout: "<layer>/<weight>:0").  When the real reference appears, its layer
#: names slot in by editing THIS table, not new machinery.
KERAS_LAYER_NAMES = {
    "enc/embed": "encoder_embedding",
    "enc/cell": "encoder_rnn",
    "enc/gat": "encoder_gat",
    "dec/embed": "decoder_embedding",
    "dec/cell": "decoder_rnn",
    "dec/gat": "decoder_gat",
    "bridge_h": "bridge_h",
    "bridge_c": "bridge_c",
    "head": "head",
}


def _np32(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def _cell_from_keras(weights: Dict[str, Any], kind: str) -> Params:
    """{kernel, recurrent_kernel, bias} (a Keras cell's get_weights(), named)
    -> mmtraj cell params.  GRU ``reset_after`` is inferred from the bias
    rank: (2, 3H) = reset_after=True, (3H,) = reset_after=False."""
    kernel = _np32(weights["kernel"])
    rk = _np32(weights["recurrent_kernel"])
    bias = _np32(weights["bias"])
    H = rk.shape[0]
    if kind == "gru":
        if bias.ndim == 2:  # reset_after=True: dual bias, CuDNN-equivalent
            return {"wx": kernel, "wh": rk, "b": bias[0], "bh": bias[1]}
        # reset_after=False: reset-before-matmul candidate (cells.py wh_n)
        return {
            "wx": kernel,
            "wh": np.ascontiguousarray(rk[:, : 2 * H]),
            "wh_n": np.ascontiguousarray(rk[:, 2 * H :]),
            "b": bias,
        }
    b = bias.copy()
    # mmtraj applies sigmoid(f + 1.0); Keras' trained bias already contains
    # its full forget bias (unit_forget_bias init) -> shift f rows down by 1.
    b[H : 2 * H] -= 1.0
    return {"wx": kernel, "wh": rk, "b": b}


def _cell_to_keras(p: Params, kind: str) -> Dict[str, np.ndarray]:
    """Inverse of _cell_from_keras; always writes the reset_after=True (dual
    bias) GRU layout — the TF2-era default and the exactly-equivalent form."""
    wx, b = _np32(p["wx"]), _np32(p["b"])
    H = wx.shape[1] // (3 if kind == "gru" else 4)
    if kind == "gru":
        if "wh_n" in p:  # reset_after=False import round-trips as such
            rk = np.concatenate([_np32(p["wh"]), _np32(p["wh_n"])], axis=1)
            return {"kernel": wx, "recurrent_kernel": rk, "bias": b}
        bh = _np32(p.get("bh", np.zeros_like(b)))
        return {
            "kernel": wx,
            "recurrent_kernel": _np32(p["wh"]),
            "bias": np.stack([b, bh]),
        }
    b = b.copy()
    if "bh" in p:
        # Torch-imported LSTMs carry a separate recurrent bias; the LSTM
        # gate math is purely additive (no reset multiplication), so folding
        # it into Keras' single fused bias is exact.
        b = b + _np32(p["bh"])
    b[H : 2 * H] += 1.0
    return {"kernel": wx, "recurrent_kernel": _np32(p["wh"]), "bias": b}


def export_keras_weights(params: Params, cfg: ModelConfig) -> Dict[str, Dict[str, np.ndarray]]:
    """mmtraj params -> {layer_name: {weight_name: array}} in Keras
    conventions (kernel (in, out), GRU dual bias, LSTM forget +1)."""
    _require_rnn_encoder(cfg, "export_keras_weights")
    import jax

    params = jax.device_get(params)
    L = KERAS_LAYER_NAMES
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for mod, coder in (("enc", "encoder"), ("dec", "decoder")):
        out[L[f"{mod}/embed"]] = {
            "kernel": _np32(params[mod]["embed"]["w"]),
            "bias": _np32(params[mod]["embed"]["b"]),
        }
        out[L[f"{mod}/cell"]] = _cell_to_keras(params[mod]["cell"], cfg.cell)
        if cfg.social:
            g = params[mod]["gat"]
            out[L[f"{mod}/gat"]] = {
                "value_kernel": _np32(g["wv"]),
                "attn_src": _np32(g["a_src"]),
                "attn_dst": _np32(g["a_dst"]),
                "out_kernel": _np32(g["wo"]),
                "out_bias": _np32(g["bo"]),
            }
    out[L["bridge_h"]] = {"kernel": _np32(params["bridge_h"]["w"]),
                          "bias": _np32(params["bridge_h"]["b"])}
    if cfg.cell == "lstm":
        out[L["bridge_c"]] = {"kernel": _np32(params["bridge_c"]["w"]),
                              "bias": _np32(params["bridge_c"]["b"])}
    out[L["head"]] = {"kernel": _np32(params["head"]["w"]),
                      "bias": _np32(params["head"]["b"])}
    return out


def import_keras_weights(layers: Dict[str, Dict[str, Any]], cfg: ModelConfig) -> Params:
    """{layer_name: {weight_name: array}} in Keras conventions -> mmtraj
    params.  Raises KeyError naming the first missing layer/weight, so a
    convention mismatch is a one-line diagnosis (same contract as
    import_state_dict)."""
    _require_rnn_encoder(cfg, "import_keras_weights")
    L = KERAS_LAYER_NAMES

    def dense(name):
        lw = layers[name]
        return {"w": _np32(lw["kernel"]), "b": _np32(lw["bias"])}

    def gat(name):
        lw = layers[name]
        return {
            "wv": _np32(lw["value_kernel"]),
            "a_src": _np32(lw["attn_src"]),
            "a_dst": _np32(lw["attn_dst"]),
            "wo": _np32(lw["out_kernel"]),
            "bo": _np32(lw["out_bias"]),
        }

    params: Params = {
        "enc": {"embed": dense(L["enc/embed"]),
                "cell": _cell_from_keras(layers[L["enc/cell"]], cfg.cell)},
        "dec": {"embed": dense(L["dec/embed"]),
                "cell": _cell_from_keras(layers[L["dec/cell"]], cfg.cell)},
        "bridge_h": dense(L["bridge_h"]),
    }
    if cfg.cell == "lstm":
        params["bridge_c"] = dense(L["bridge_c"])
    if cfg.social:
        params["enc"]["gat"] = gat(L["enc/gat"])
        params["dec"]["gat"] = gat(L["dec/gat"])
    params["head"] = dense(L["head"])
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params)


def save_keras_h5(path: str, params: Params, cfg: ModelConfig) -> None:
    """Write the legacy Keras ``save_weights`` HDF5 layout: root attrs
    ``layer_names``, one group per layer with attrs ``weight_names`` naming
    ``<layer>/<weight>:0`` datasets — the TF/Keras-era on-disk convention
    (Keras 3 can only WRITE its new .weights.h5 format, so fabricated
    fixtures and exports use this writer)."""
    import h5py

    layers = export_keras_weights(params, cfg)
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [n.encode("utf8") for n in layers], dtype="S"
        )
        f.attrs["backend"] = np.bytes_(b"tensorflow")
        for lname, weights in layers.items():
            g = f.create_group(lname)
            wnames = [f"{lname}/{w}:0" for w in weights]
            g.attrs["weight_names"] = np.array(
                [n.encode("utf8") for n in wnames], dtype="S"
            )
            for wname, arr in zip(wnames, weights.values()):
                g.create_dataset(wname, data=arr)


def load_keras_h5(path: str, cfg: ModelConfig) -> Params:
    """Read a legacy Keras ``save_weights`` .h5 (see save_keras_h5) into
    mmtraj params.  Handles both the bare save_weights layout and the
    ``model_weights`` subgroup written by full-model ``save`` ."""
    import h5py

    layers: Dict[str, Dict[str, np.ndarray]] = {}
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        layer_names = [
            n.decode("utf8") if isinstance(n, bytes) else str(n)
            for n in root.attrs["layer_names"]
        ]
        for lname in layer_names:
            g = root[lname]
            weights: Dict[str, np.ndarray] = {}
            for wname in g.attrs["weight_names"]:
                wname = wname.decode("utf8") if isinstance(wname, bytes) else str(wname)
                # "<layer>/<weight>:0" -> "<weight>"
                short = wname.rsplit("/", 1)[-1].split(":")[0]
                weights[short] = np.asarray(g[wname])
            layers[lname] = weights
    return import_keras_weights(layers, cfg)
