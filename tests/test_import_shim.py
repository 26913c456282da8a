"""Reference-checkpoint import shim: the PARITY.md "key-rename" claim, proven.

Three layers of evidence:
1. round-trip: mmtraj params -> torch-convention state_dict -> mmtraj params
   is the identity (every transform has a correct inverse);
2. semantics: a REAL ``torch.nn.GRUCell``/``LSTMCell``'s weights imported
   through the shim drive mmtraj's cell to the same outputs (gate packing,
   bias placement, and the forget-gate +1 are actually right, not just
   renamed);
3. end-to-end: a fabricated reference-convention ``.pt`` file loads through
   ``import_reference_checkpoint`` and the full forecaster forward matches
   the original params' output exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmtraj.config import ModelConfig
from mmtraj.interop import (
    export_state_dict,
    import_reference_checkpoint,
    import_state_dict,
)
from mmtraj.models.cells import Carry, cell_apply
from mmtraj.models.forecaster import Forecaster

torch = pytest.importorskip("torch")


def _tree_allclose(a, b, atol=0.0):
    la, lb = jax.tree.leaves_with_path(a), jax.tree.leaves_with_path(b)
    keys_a = {jax.tree_util.keystr(p) for p, _ in la}
    keys_b = {jax.tree_util.keystr(p) for p, _ in lb}
    # Import adds the optional 'bh' recurrent-bias leaves (zeros on export of
    # native params); every other leaf must match exactly.
    assert keys_b - keys_a == set() or keys_a - keys_b == set()
    da = {jax.tree_util.keystr(p): v for p, v in la}
    for p, v in lb:
        k = jax.tree_util.keystr(p)
        if k not in da:
            np.testing.assert_allclose(np.asarray(v), 0.0)
            continue
        np.testing.assert_allclose(np.asarray(da[k]), np.asarray(v), atol=atol)


@pytest.mark.parametrize("cell,social", [("gru", True), ("lstm", False)])
def test_roundtrip_identity(cell, social):
    cfg = ModelConfig(cell=cell, social=social, num_heads=2,
                      head="gmm" if social else "deterministic")
    model = Forecaster(cfg, 8, 12)
    params = model.init(jax.random.PRNGKey(0))
    sd = export_state_dict(params, cfg)
    back = import_state_dict(sd, cfg)
    _tree_allclose(params, back)


@pytest.mark.parametrize("kind", ["gru", "lstm"])
def test_cell_semantics_match_real_torch(kind):
    """Import a real torch recurrent cell's weights; outputs must match to
    float32 tolerance on random inputs — proving gate order, bias placement,
    and the LSTM forget-gate shift are semantically exact."""
    torch.manual_seed(0)
    E, H, B = 6, 10, 4
    tcell = (torch.nn.GRUCell if kind == "gru" else torch.nn.LSTMCell)(E, H)
    sd = {f"encoder.rnn.{k}_l0": v.detach() for k, v in tcell.named_parameters()}

    from mmtraj.interop import _cell_from_torch

    p = _cell_from_torch({k: v.numpy() for k, v in sd.items()}, "encoder.rnn", kind)
    p = jax.tree.map(jnp.asarray, p)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, E)).astype(np.float32)
    h0 = rng.normal(size=(B, H)).astype(np.float32)
    c0 = rng.normal(size=(B, H)).astype(np.float32)

    if kind == "gru":
        want = tcell(torch.from_numpy(x), torch.from_numpy(h0)).detach().numpy()
    else:
        hN, cN = tcell(torch.from_numpy(x), (torch.from_numpy(h0), torch.from_numpy(c0)))
        want, want_c = hN.detach().numpy(), cN.detach().numpy()

    got = cell_apply(p, kind, jnp.asarray(x), Carry(h=jnp.asarray(h0), c=jnp.asarray(c0)))
    np.testing.assert_allclose(np.asarray(got.h), want, atol=2e-6)
    if kind == "lstm":
        np.testing.assert_allclose(np.asarray(got.c), want_c, atol=2e-6)


def test_fabricated_reference_pt_forward_parity(tmp_path):
    """Fabricate a reference-convention .pt (torch state_dict, torch-style
    names), load via the shim, and check the full model forward is identical
    to the source params."""
    cfg = ModelConfig(cell="gru", social=True, num_heads=2, head="gmm")
    model = Forecaster(cfg, 4, 3)  # short horizon: the property is key mapping
    params = model.init(jax.random.PRNGKey(3))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v).copy())
          for k, v in export_state_dict(params, cfg).items()}
    path = str(tmp_path / "reference_model.pt")
    torch.save({"state_dict": sd, "epoch": 99}, path)

    imported = import_reference_checkpoint(path, cfg)

    rng = np.random.default_rng(7)
    xy = np.cumsum(rng.normal(size=(3, 5, 7, 2)).astype(np.float32) * 0.3, axis=2)
    mask = np.ones((3, 5), bool)
    mask[2, 3:] = False
    from mmtraj.data.transforms import NormStats

    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.3, np.float32))
    loss_a, _ = model.loss(params, jnp.asarray(xy), jnp.asarray(mask), stats)
    loss_b, _ = model.loss(imported, jnp.asarray(xy), jnp.asarray(mask), stats)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)

    roll_a = model.rollout_k(params, jnp.asarray(xy[:, :, :4]), jnp.asarray(mask),
                             stats, jax.random.PRNGKey(0), 4)
    roll_b = model.rollout_k(imported, jnp.asarray(xy[:, :, :4]), jnp.asarray(mask),
                             stats, jax.random.PRNGKey(0), 4)
    np.testing.assert_allclose(np.asarray(roll_a), np.asarray(roll_b), atol=1e-5)


def test_missing_key_is_one_line_diagnosis():
    cfg = ModelConfig(cell="gru", social=True, num_heads=2)
    with pytest.raises(KeyError, match="encoder.embedding.weight"):
        import_state_dict({}, cfg)


# -- Keras-convention shim (SURVEY.md §5: "TF/Keras .h5 vs torch — the top
# thing to check"; VERDICT r2 next-round #1) ---------------------------------


@pytest.fixture(scope="module")
def keras():
    return pytest.importorskip("keras")


def _keras_cell_weights(cell):
    """Name a Keras cell's get_weights() triplet."""
    w = cell.get_weights()
    return {"kernel": w[0], "recurrent_kernel": w[1], "bias": w[2]}


@pytest.mark.slow
@pytest.mark.parametrize("reset_after", [True, False])
def test_keras_gru_cell_semantics(keras, reset_after):
    """Import a REAL keras.layers.GRUCell's weights (both reset_after
    conventions); mmtraj's cell must reproduce its output to f32 tolerance —
    proving the (z, r, h) gate order, the dual-bias placement
    (reset_after=True -> bh) and the reset-before-matmul candidate
    (reset_after=False -> wh_n) are semantically exact."""
    from mmtraj.interop import _cell_from_keras

    keras.utils.set_random_seed(0)
    E, H, B = 6, 10, 4
    kcell = keras.layers.GRUCell(H, reset_after=reset_after)
    kcell.build((B, E))

    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, E)).astype(np.float32)
    h0 = rng.normal(size=(B, H)).astype(np.float32)
    out = kcell(keras.ops.convert_to_tensor(x), [keras.ops.convert_to_tensor(h0)])
    want = keras.ops.convert_to_numpy(out[0])

    weights = _keras_cell_weights(kcell)
    assert weights["bias"].ndim == (2 if reset_after else 1)
    p = jax.tree.map(jnp.asarray, _cell_from_keras(weights, "gru"))
    assert ("bh" in p) == reset_after
    assert ("wh_n" in p) == (not reset_after)
    got = cell_apply(p, "gru", jnp.asarray(x),
                     Carry(h=jnp.asarray(h0), c=jnp.zeros_like(jnp.asarray(h0))))
    np.testing.assert_allclose(np.asarray(got.h), want, atol=2e-6)


@pytest.mark.slow
def test_keras_lstm_cell_semantics(keras):
    """Real keras.layers.LSTMCell (unit_forget_bias default) -> mmtraj LSTM:
    the (i, f, c, o) packing and the forget-gate -1 shift must be exact."""
    from mmtraj.interop import _cell_from_keras

    keras.utils.set_random_seed(0)
    E, H, B = 6, 10, 4
    kcell = keras.layers.LSTMCell(H)
    kcell.build((B, E))

    rng = np.random.default_rng(2)
    x = rng.normal(size=(B, E)).astype(np.float32)
    h0 = rng.normal(size=(B, H)).astype(np.float32)
    c0 = rng.normal(size=(B, H)).astype(np.float32)
    out, states = kcell(
        keras.ops.convert_to_tensor(x),
        [keras.ops.convert_to_tensor(h0), keras.ops.convert_to_tensor(c0)],
    )
    want_h = keras.ops.convert_to_numpy(out)
    want_c = keras.ops.convert_to_numpy(states[1])

    p = jax.tree.map(jnp.asarray, _cell_from_keras(_keras_cell_weights(kcell), "lstm"))
    got = cell_apply(p, "lstm", jnp.asarray(x),
                     Carry(h=jnp.asarray(h0), c=jnp.asarray(c0)))
    np.testing.assert_allclose(np.asarray(got.h), want_h, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got.c), want_c, atol=2e-6)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.slow
def test_keras_h5_roundtrip_forward_parity(cell, tmp_path):
    """mmtraj params -> legacy save_weights .h5 -> import: the full model
    forward must be identical (the Keras twin of the fabricated-.pt test)."""
    from mmtraj.interop import load_keras_h5, save_keras_h5

    # Short horizon: the property is weight-layout semantics, not dynamics.
    cfg = ModelConfig(cell=cell, social=True, num_heads=2, head="gmm")
    model = Forecaster(cfg, 4, 3)
    params = model.init(jax.random.PRNGKey(5))
    path = str(tmp_path / "reference_weights.h5")
    save_keras_h5(path, params, cfg)
    imported = load_keras_h5(path, cfg)

    rng = np.random.default_rng(9)
    xy = np.cumsum(rng.normal(size=(3, 5, 7, 2)).astype(np.float32) * 0.3, axis=2)
    mask = np.ones((3, 5), bool)
    mask[1, 2:] = False
    from mmtraj.data.transforms import NormStats

    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.3, np.float32))
    loss_a, _ = model.loss(params, jnp.asarray(xy), jnp.asarray(mask), stats)
    loss_b, _ = model.loss(imported, jnp.asarray(xy), jnp.asarray(mask), stats)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)

    roll_a = model.rollout_k(params, jnp.asarray(xy[:, :, :4]), jnp.asarray(mask),
                             stats, jax.random.PRNGKey(0), 4)
    roll_b = model.rollout_k(imported, jnp.asarray(xy[:, :, :4]), jnp.asarray(mask),
                             stats, jax.random.PRNGKey(0), 4)
    np.testing.assert_allclose(np.asarray(roll_a), np.asarray(roll_b), atol=1e-5)


@pytest.mark.slow
def test_keras_gru_sequence_parity_through_forecaster(keras):
    """Multi-step recurrence parity: drive a real Keras GRU layer over a
    sequence and mmtraj's scan-based encoder cell over the same inputs with
    the imported weights — per-step hidden states must track exactly.
    (reset_after=False exercises the wh_n path through lax.scan.)"""
    from mmtraj.interop import _cell_from_keras

    keras.utils.set_random_seed(1)
    E, H, B, T = 4, 8, 3, 6
    layer = keras.layers.GRU(H, reset_after=False, return_sequences=True)
    layer.build((B, T, E))
    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, T, E)).astype(np.float32)
    want = keras.ops.convert_to_numpy(layer(keras.ops.convert_to_tensor(x)))

    p = jax.tree.map(jnp.asarray, _cell_from_keras(_keras_cell_weights(layer.cell), "gru"))

    def body(h, x_t):
        new = cell_apply(p, "gru", x_t, Carry(h=h, c=jnp.zeros_like(h)))
        return new.h, new.h

    _, hs = jax.lax.scan(body, jnp.zeros((B, H)), jnp.moveaxis(jnp.asarray(x), 1, 0))
    np.testing.assert_allclose(np.moveaxis(np.asarray(hs), 0, 1), want, atol=5e-6)


def test_keras_missing_layer_is_one_line_diagnosis():
    from mmtraj.interop import import_keras_weights

    cfg = ModelConfig(cell="gru", social=True, num_heads=2)
    with pytest.raises(KeyError, match="encoder_embedding"):
        import_keras_weights({}, cfg)


@pytest.mark.slow
def test_keras_reset_after_false_full_model_runs():
    """A forecaster whose cells carry the reset_after=False wh_n params must
    run the full loss + rollout paths (the import-only cell variant threads
    through encode/decode scans and stays finite)."""
    from mmtraj.interop import _cell_from_keras

    cfg = ModelConfig(cell="gru", social=True, num_heads=2, head="gmm")
    model = Forecaster(cfg, 4, 3)  # short horizon: the property is the cell
    params = model.init(jax.random.PRNGKey(0))  # variant, not the dynamics
    rng = np.random.default_rng(11)
    H, E = cfg.hidden_dim, cfg.embed_dim
    for mod in ("enc", "dec"):
        raw = {
            "kernel": rng.normal(size=(E, 3 * H)).astype(np.float32) * 0.2,
            "recurrent_kernel": rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.2,
            "bias": rng.normal(size=(3 * H,)).astype(np.float32) * 0.1,
        }
        params[mod]["cell"] = jax.tree.map(jnp.asarray, _cell_from_keras(raw, "gru"))
        assert "wh_n" in params[mod]["cell"]

    from mmtraj.data.transforms import NormStats

    xy = np.cumsum(rng.normal(size=(2, 4, 7, 2)).astype(np.float32) * 0.3, axis=2)
    mask = np.ones((2, 4), bool)
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.3, np.float32))
    loss, _ = model.loss(params, jnp.asarray(xy), jnp.asarray(mask), stats)
    assert np.isfinite(float(loss))
    roll = model.rollout_k(params, jnp.asarray(xy[:, :, :4]), jnp.asarray(mask),
                           stats, jax.random.PRNGKey(1), 3)
    assert np.isfinite(np.asarray(roll)).all()
    # Fine-tuning imported reset_after=False weights: gradient reaches wh_n.
    grads = jax.grad(
        lambda p: model.loss(p, jnp.asarray(xy), jnp.asarray(mask), stats)[0]
    )(params)
    g = np.asarray(grads["enc"]["cell"]["wh_n"])
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_cell_to_keras_folds_lstm_recurrent_bias(keras):
    """A torch-imported LSTM carries a separate recurrent bias ``bh``; the
    Keras export must fold it into the single fused bias (the LSTM gate math
    is additive, so b + bh is exact) — previously it was silently dropped."""
    from mmtraj.interop import _cell_to_keras

    E, H, B = 6, 10, 4
    rng = np.random.default_rng(3)
    p = {
        "wx": rng.normal(size=(E, 4 * H)).astype(np.float32) * 0.3,
        "wh": rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.3,
        "b": rng.normal(size=(4 * H,)).astype(np.float32) * 0.3,
        "bh": rng.normal(size=(4 * H,)).astype(np.float32) * 0.3,
    }
    w = _cell_to_keras(p, "lstm")
    kcell = keras.layers.LSTMCell(H)
    kcell.build((B, E))
    kcell.set_weights([w["kernel"], w["recurrent_kernel"], w["bias"]])

    x = rng.normal(size=(B, E)).astype(np.float32)
    h0 = rng.normal(size=(B, H)).astype(np.float32)
    c0 = rng.normal(size=(B, H)).astype(np.float32)
    out, states = kcell(
        keras.ops.convert_to_tensor(x),
        [keras.ops.convert_to_tensor(h0), keras.ops.convert_to_tensor(c0)],
    )
    got = cell_apply(jax.tree.map(jnp.asarray, p), "lstm", jnp.asarray(x),
                     Carry(h=jnp.asarray(h0), c=jnp.asarray(c0)))
    np.testing.assert_allclose(np.asarray(got.h),
                               keras.ops.convert_to_numpy(out), atol=2e-6)
    np.testing.assert_allclose(np.asarray(got.c),
                               keras.ops.convert_to_numpy(states[1]), atol=2e-6)
