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
    model = Forecaster(cfg, 8, 12)
    params = model.init(jax.random.PRNGKey(3))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v).copy())
          for k, v in export_state_dict(params, cfg).items()}
    path = str(tmp_path / "reference_model.pt")
    torch.save({"state_dict": sd, "epoch": 99}, path)

    imported = import_reference_checkpoint(path, cfg)

    rng = np.random.default_rng(7)
    xy = np.cumsum(rng.normal(size=(3, 5, 20, 2)).astype(np.float32) * 0.3, axis=2)
    mask = np.ones((3, 5), bool)
    mask[2, 3:] = False
    from mmtraj.data.transforms import NormStats

    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.3, np.float32))
    loss_a, _ = model.loss(params, jnp.asarray(xy), jnp.asarray(mask), stats)
    loss_b, _ = model.loss(imported, jnp.asarray(xy), jnp.asarray(mask), stats)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)

    roll_a = model.rollout_k(params, jnp.asarray(xy[:, :, :8]), jnp.asarray(mask),
                             stats, jax.random.PRNGKey(0), 4)
    roll_b = model.rollout_k(imported, jnp.asarray(xy[:, :, :8]), jnp.asarray(mask),
                             stats, jax.random.PRNGKey(0), 4)
    np.testing.assert_allclose(np.asarray(roll_a), np.asarray(roll_b), atol=1e-5)


def test_missing_key_is_one_line_diagnosis():
    cfg = ModelConfig(cell="gru", social=True, num_heads=2)
    with pytest.raises(KeyError, match="encoder.embedding.weight"):
        import_state_dict({}, cfg)
