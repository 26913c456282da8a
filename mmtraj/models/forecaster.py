"""The trajectory forecaster family: social GAT + RNN encoder-decoder + heads.

One configurable pure-JAX model covers the reference's whole ladder
(BASELINE.json:7-11, see mmtraj/config.py presets):

* encoder: per-agent fused-gate GRU/LSTM over observed per-step offsets, with
  an optional per-frame social refinement — proximity adjacency rebuilt from
  the CURRENT frame's absolute positions, multi-head GAT message passing,
  residual into the hidden state (BASELINE.json:5).  A second encoder family
  (`cfg.encoder="attn"`, mmtraj/models/attn_encoder.py) swaps the recurrence
  for causal temporal self-attention interleaved with the same per-frame GAT
  — the transformer successor lineage (STAR/AgentFormer) to the reference's
  RNN, with no sequential dependency over the observation steps.
* decoder: same cell + social refinement, autoregressive; the adjacency is
  recomputed INSIDE the `lax.scan` body from sampled positions, so the social
  graph tracks each hypothetical future (SURVEY.md §7 hard part 4) without
  retracing.
* heads: deterministic offset regression, or a bivariate-GMM multimodal head
  with K-sample rollouts vectorized by `vmap` over RNG keys (BASELINE.json:5).

Everything is fixed-shape (B, N_max, ...) with a validity mask; recurrence is
`lax.scan` over time (one XLA program per step fn — the reference's
host<->device per-frame round trips collapse away, SURVEY.md §3.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mmtraj.config import ModelConfig
from mmtraj.data.transforms import NormStats, denormalize, normalize, to_relative
from mmtraj.graph.adjacency import proximity_adjacency
from mmtraj.models import gmm
from mmtraj.models.cells import Carry, cell_apply, cell_init, init_carry
from mmtraj.models.gat import gat_apply, gat_init
from mmtraj.models.layers import Params, dense, dense_init, maybe_remat


def _compute_dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else None


# Scan bodies checkpoint via the shared helper (policies pinned math-exact).
_maybe_remat = maybe_remat


def init_params(key: jax.Array, cfg: ModelConfig) -> Params:
    E, H = cfg.embed_dim, cfg.hidden_dim
    if cfg.encoder not in ("rnn", "attn"):
        raise ValueError(f"unknown encoder {cfg.encoder!r}; choose 'rnn' or 'attn'")
    ks = jax.random.split(key, 10)
    if cfg.encoder == "attn":
        from mmtraj.models.attn_encoder import attn_encoder_init

        enc: Params = attn_encoder_init(ks[0], cfg)
    else:
        enc = {
            "embed": dense_init(ks[0], 2, E),
            "cell": cell_init(ks[1], cfg.cell, E, H),
        }
        if cfg.social:
            enc["gat"] = gat_init(ks[6], H, H, cfg.num_heads)
            for li in range(1, cfg.gat_layers):
                enc[f"gat_{li}"] = gat_init(
                    jax.random.fold_in(ks[6], li), H, H, cfg.num_heads)
    params: Params = {
        "enc": enc,
        "dec": {
            "embed": dense_init(ks[2], 2, E),
            "cell": cell_init(ks[3], cfg.cell, E, H),
        },
        "bridge_h": dense_init(ks[4], H, H),
    }
    if cfg.cell == "lstm":
        params["bridge_c"] = dense_init(ks[5], H, H)
    if cfg.social:
        params["dec"]["gat"] = gat_init(ks[7], H, H, cfg.num_heads)
        for li in range(1, cfg.gat_layers):
            params["dec"][f"gat_{li}"] = gat_init(
                jax.random.fold_in(ks[7], li), H, H, cfg.num_heads)
    if cfg.head == "gmm":
        params["head"] = gmm.head_init(ks[8], H, cfg.num_mixtures)
    else:
        params["head"] = dense_init(ks[8], H, 2)
    return params


def _step(pp: Params, cfg: ModelConfig, carry: Carry, dxy_n, xy_abs, mask,
          drop=None, train: bool = False) -> Carry:
    """Advance one frame: embed offset -> cell -> social GAT refinement.

    ``drop``: optional variational-dropout masks {"emb": (B,N,E), "gat":
    (B,N,H)}, pre-scaled by 1/keep.  Drawn ONCE per forward pass and reused
    every scan step (recurrent dropout a la Gal & Ghahramani) — so they are
    scan-carried constants, not per-step RNG.

    ``train``: marks a differentiated path — gat_apply's "auto" attend
    dispatch then stays on the XLA chain (the dense-N Pallas kernel wins
    inference but loses the grad program; ARCHITECTURE.md pt 13).
    """
    dt = _compute_dtype(cfg)
    x = jax.nn.relu(dense(pp["embed"], dxy_n, dt))
    if drop is not None:
        x = x * drop["emb"]
    carry = cell_apply(pp["cell"], cfg.cell, x, carry, dt)
    if cfg.social:
        adj = proximity_adjacency(xy_abs, mask, cfg.adjacency_radius)
        # gat_layers stacked message-passing rounds over the SAME frame
        # adjacency: round li re-attends over the residual-updated hidden
        # states (receptive field = li+1 hops).  The variational dropout
        # mask is shared across rounds (one mask per forward pass, like the
        # scan steps).  gat_layers=1 is the reference-parity path and
        # traces byte-identically to the pre-knob program.
        for li in range(cfg.gat_layers):
            g = gat_apply(
                pp["gat" if li == 0 else f"gat_{li}"], carry.h, adj, mask,
                cfg.num_heads, dt,
                use_pallas=cfg.use_pallas, attend_kernel=cfg.attend_kernel,
                train=train,
            )
            if drop is not None:
                g = g * drop["gat"]
            carry = Carry(h=carry.h + g, c=carry.c)
    return carry


def _dropout_masks(key, cfg: ModelConfig, B: int, N: int):
    """Two variational masks per coder, pre-scaled by 1/keep (inverted
    dropout: eval needs no rescale)."""
    keep = 1.0 - cfg.dropout
    ks = jax.random.split(key, 4)
    bern = lambda k, d: (  # noqa: E731
        jax.random.bernoulli(k, keep, (B, N, d)).astype(jnp.float32) / keep
    )
    return (
        {"emb": bern(ks[0], cfg.embed_dim), "gat": bern(ks[1], cfg.hidden_dim)},
        {"emb": bern(ks[2], cfg.embed_dim), "gat": bern(ks[3], cfg.hidden_dim)},
    )


class Forecaster:
    """Thin stateless wrapper binding a ModelConfig + sequence lengths to the
    pure functions below.  All methods are jit/vmap/shard_map-safe."""

    def __init__(self, cfg: ModelConfig, obs_len: int, pred_len: int):
        self.cfg = cfg
        self.obs_len = obs_len
        self.pred_len = pred_len

    # Value semantics (frozen config + ints) so jit/caching layers can key on
    # the model identity across instances.
    def __eq__(self, other):
        return (
            isinstance(other, Forecaster)
            and (self.cfg, self.obs_len, self.pred_len)
            == (other.cfg, other.obs_len, other.pred_len)
        )

    def __hash__(self):
        return hash((self.cfg, self.obs_len, self.pred_len))

    # -- init ---------------------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        return init_params(key, self.cfg)

    # -- encoder ------------------------------------------------------------
    def encode(self, params: Params, xy_obs, mask, stats: NormStats,
               drop=None, train: bool = False) -> Carry:
        """xy_obs (B, N, To, 2) absolute meters, mask (B, N) -> decoder-ready
        carry (bridged).  ``drop``: training-only variational-dropout masks
        (see _step)."""
        cfg = self.cfg
        B, N = mask.shape
        dxy_n = normalize(to_relative(xy_obs), stats)
        if cfg.encoder == "attn":
            from mmtraj.models.attn_encoder import attn_encode

            feat = attn_encode(params["enc"], cfg, xy_obs, dxy_n, mask, drop,
                               train=train, compute_dtype=_compute_dtype(cfg))
            h = jnp.tanh(dense(params["bridge_h"], feat))
            c = (
                jnp.tanh(dense(params["bridge_c"], feat))
                if cfg.cell == "lstm"
                else jnp.zeros_like(h)
            )
            return Carry(h=h, c=c)
        xs = (
            jnp.moveaxis(dxy_n, 2, 0),  # (To, B, N, 2)
            jnp.moveaxis(xy_obs, 2, 0),
        )
        carry0 = init_carry((B, N), cfg.hidden_dim)

        def body(carry, x):
            dxy_t, xy_t = x
            return _step(params["enc"], cfg, carry, dxy_t, xy_t, mask, drop,
                         train=train), None

        body = _maybe_remat(cfg, body)
        carry, _ = jax.lax.scan(body, carry0, xs, unroll=cfg.scan_unroll)

        h = jnp.tanh(dense(params["bridge_h"], carry.h))
        c = (
            jnp.tanh(dense(params["bridge_c"], carry.c))
            if cfg.cell == "lstm"
            else jnp.zeros_like(carry.c)
        )
        return Carry(h=h, c=c)

    # -- heads --------------------------------------------------------------
    def _head(self, params: Params, h):
        cfg = self.cfg
        if cfg.head == "gmm":
            return gmm.head_apply(
                params["head"], h, cfg.num_mixtures, cfg.sigma_min, cfg.rho_max
            )
        return dense(params["head"], h).astype(jnp.float32)

    # -- training decode (teacher forcing) ----------------------------------
    def decode_teacher(self, params: Params, carry: Carry, xy_fut, dxy_fut_n, mask,
                       drop=None):
        """Teacher-forced decode: at step t emit the head output predicting
        offset t from the pre-step state, then advance on ground truth.

        xy_fut (B, N, Tp, 2) absolute, dxy_fut_n (B, N, Tp, 2) normalized
        target offsets.  Returns head outputs with step axis at -2:
        GMMParams leaves (B, N, Tp, ...) or (B, N, Tp, 2) for deterministic.
        """
        cfg = self.cfg
        xs = (jnp.moveaxis(dxy_fut_n, 2, 0), jnp.moveaxis(xy_fut, 2, 0))

        def body(carry, x):
            dxy_t, xy_t = x
            out = self._head(params, carry.h)
            carry = _step(params["dec"], cfg, carry, dxy_t, xy_t, mask, drop,
                          train=True)
            return carry, out

        body = _maybe_remat(cfg, body)
        _, outs = jax.lax.scan(body, carry, xs, unroll=cfg.scan_unroll)
        # (Tp, B, N, ...) -> (B, N, Tp, ...)
        return jax.tree.map(lambda a: jnp.moveaxis(a, 0, 2), outs)

    # -- rollout RNG streams --------------------------------------------------
    def _rollout_stream(self, key, Bk: int, N: int, sigma_scale: float = 1.0):
        """Pre-drawn rollout randomness: (gumbel (Bk,T,N,M), normal (Bk,T,N,2)).

        All randomness is drawn in ONE batched call before the scan and
        sliced per step (gumbel for component choice + standard normals).
        Splitting/drawing inside the scan body measured ~2x the entire
        rollout's runtime on v5e (threefry is VPU-heavy and the per-step
        dependency chain blocks overlap); one big draw is amortized, and the
        XLA and fused-Pallas decoders consume the identical stream, so given
        the same key they sample identical trajectories."""
        cfg = self.cfg
        T = self.pred_len
        kg, kn = jax.random.split(key)
        gumbel = jax.random.gumbel(kg, (Bk, T, N, cfg.num_mixtures), jnp.float32)
        normal = jax.random.normal(kn, (Bk, T, N, 2), jnp.float32)
        if sigma_scale != 1.0:
            normal = normal * jnp.float32(sigma_scale)
        return gumbel, normal

    def _per_window_stream(self, keys, k: int, N: int, sigma_scale: float = 1.0,
                           draw_n: int = None):
        """Per-window rollout randomness: each window's k sample streams are a
        function of ITS key alone, so sampled metrics are exactly invariant
        to batch size, batch composition, and mesh padding (VERDICT r2 weak
        #1).  keys (B,) -> (gumbel (k*B,T,N,M), normal (k*B,T,N,2)), laid out
        to match rollout_k's K-in-batch tiling (flat row kk*B + b = window b,
        sample kk).

        ``draw_n``: draw each window's stream at this CANONICAL agent
        capacity (>= N) and slice to the first N slots.  Valid agents occupy
        a contiguous prefix (data/collate.py pad_windows), so a window
        evaluated inside a narrower shape bucket (evaluate(buckets=...))
        consumes exactly the random values its agents would see in the full
        padded program — which is what makes bucketed metrics equal padded
        metrics instead of merely equally-distributed.  None = draw at N
        (the plain protocol; bit-identical traced program to before the
        knob existed)."""
        cfg = self.cfg
        T, M = self.pred_len, cfg.num_mixtures
        B = keys.shape[0]
        n_draw = N if draw_n is None else int(draw_n)
        if n_draw < N:
            raise ValueError(f"draw_n={n_draw} must be >= N={N}")

        def draw(kb):
            kg, kn = jax.random.split(kb)
            return (
                jax.random.gumbel(kg, (k, T, n_draw, M), jnp.float32)[:, :, :N],
                jax.random.normal(kn, (k, T, n_draw, 2), jnp.float32)[:, :, :N],
            )

        gumbel, normal = jax.vmap(draw)(keys)  # (B, k, T, N, ·)
        gumbel = jnp.moveaxis(gumbel, 0, 1).reshape((k * B,) + gumbel.shape[2:])
        normal = jnp.moveaxis(normal, 0, 1).reshape((k * B,) + normal.shape[2:])
        if sigma_scale != 1.0:
            normal = normal * jnp.float32(sigma_scale)
        return gumbel, normal

    # -- sampling decode (autoregressive rollout) ----------------------------
    def decode_rollout(self, params: Params, carry: Carry, xy_last, mask, stats, key,
                       sigma_scale: float = 1.0, stream=None,
                       train: bool = False, remat: bool = False):
        """One sampled rollout -> absolute positions (B, N, Tp, 2), meters.

        Offsets are sampled from the head (GMM) or taken directly
        (deterministic); positions integrate on-device and feed the next
        step's proximity graph.

        ``sigma_scale`` tempers the within-component spread (scales the
        standard-normal draws; component choice is untouched).  1.0 is the
        untempered protocol; <1 concentrates samples near component means —
        the classic best-of-K inference knob.  Static under jit.

        ``stream``: optional pre-drawn (gumbel, normal) randomness from
        `_rollout_stream`/`_per_window_stream` (sigma_scale already applied
        at the draw site); when given, ``key`` is ignored.

        ``remat``: checkpoint the scan body (honoring cfg.remat/remat_policy
        like the encoder/teacher scans).  OFF by default and irrelevant to
        inference (no residuals are saved when nothing differentiates this
        path — the 180k/s eval program is byte-identical either way); the
        variety loss turns it on because ITS backward otherwise saves every
        step's GAT attention residuals for n*B rows, and that HBM traffic —
        not recompute — binds the step (measured 2.3x on v5e: 11.8 -> 27.1
        steps/s at B=128 n=8 f32, the quality-headline recipe's objective;
        FLOPs/step rise 20.4 -> 25.3 GF from the replay and the step still
        more than doubles).
        """
        cfg = self.cfg
        B, N = mask.shape
        T = self.pred_len
        if cfg.head == "gmm":
            if stream is None:
                stream = self._rollout_stream(key, B, N, sigma_scale)
            gumbel, normal = stream
            xs = (jnp.moveaxis(gumbel, 1, 0), jnp.moveaxis(normal, 1, 0))
        else:
            xs = (jnp.zeros((T, 0)), jnp.zeros((T, 0)))

        def body(state, x):
            gum_t, nrm_t = x
            carry, xy = state
            out = self._head(params, carry.h)
            if cfg.head == "gmm":
                dxy_n = gmm.sample_from(out, gum_t, nrm_t)
            else:
                dxy_n = out
            xy_new = xy + denormalize(dxy_n, stats)
            carry = _step(params["dec"], cfg, carry, dxy_n, xy_new, mask,
                          train=train)
            return (carry, xy_new), xy_new

        if remat:
            body = _maybe_remat(cfg, body)
        _, traj = jax.lax.scan(body, (carry, xy_last), xs, unroll=cfg.scan_unroll)
        return jnp.moveaxis(traj, 0, 2)  # (B, N, Tp, 2)

    # -- public API ----------------------------------------------------------
    def loss(self, params: Params, xy, mask, stats: NormStats, key=None):
        """Training objective on a full window xy (B, N, To+Tp, 2).

        GMM head: mixture NLL of normalized target offsets (float32,
        log-sum-exp — SURVEY.md §7 hard part 3).  Deterministic head: MSE on
        normalized offsets.  Masked mean over valid agent-steps.

        ``key``: RNG for variational dropout; required iff ``cfg.dropout > 0``
        and training (pass None for a deterministic/eval loss — e.g. the
        teacher-forced NLL metric never drops units).
        """
        cfg = self.cfg
        To = self.obs_len
        if xy.shape[2] != self.obs_len + self.pred_len:
            raise ValueError(
                f"loss expects full windows of {self.obs_len}+{self.pred_len} "
                f"frames, got T={xy.shape[2]}"
            )
        xy_obs, xy_fut = xy[:, :, :To], xy[:, :, To:]
        dxy_n = normalize(to_relative(xy), stats)
        dxy_fut_n = dxy_n[:, :, To:]

        drop_enc = drop_dec = None
        if key is not None and cfg.dropout > 0.0:
            drop_enc, drop_dec = _dropout_masks(key, cfg, *mask.shape)
        carry = self.encode(params, xy_obs, mask, stats, drop_enc, train=True)
        outs = self.decode_teacher(params, carry, xy_fut, dxy_fut_n, mask, drop_dec)

        if cfg.head == "gmm":
            per_step = gmm.nll(outs, dxy_fut_n)  # (B, N, Tp)
        else:
            per_step = jnp.sum((outs - dxy_fut_n) ** 2, axis=-1)  # (B, N, Tp)

        w = mask[..., None].astype(jnp.float32)  # (B, N, 1) broadcast over Tp
        denom = jnp.maximum(w.sum() * per_step.shape[-1], 1.0)
        loss = jnp.sum(per_step * w) / denom
        return loss, {"loss": loss}

    def loss_variety(self, params: Params, xy, mask, stats: NormStats, key,
                     n_samples: int, drop_key=None, fde_weight: float = 0.0):
        """Winner-takes-all (variety) objective: min-over-samples rollout MSE.

        Draws ``n_samples`` autoregressive sampled rollouts (the same program
        the best-of-K eval runs) and scores each agent by its BEST sample's
        mean squared L2 position error over the 12 prediction steps — the
        Social-GAN variety loss, here training the exact metric the contract
        judges (best-of-K ADE, BASELINE.json:2).  Masked mean over agents.

        ``fde_weight`` adds lambda * (final-step squared error) to each
        sample's score before the min — the WTA analogue of weighting FDE
        alongside ADE (the plain objective weights every step equally, which
        trains min-ADE well but leaves FDE on the table — measured tables in
        RESULTS.md).

        Gradients flow through the reparameterized GMM draws (mu + sigma *
        eps of the chosen component) and the full decoder recurrence; the
        component CHOICE is a hard selection and gets no gradient — pair with
        the NLL term (loss="hybrid") to keep the mixture logits trained.

        ``drop_key``: training-time variational dropout for the ENCODER
        (rollout decode always runs without dropout, matching inference).
        """
        cfg = self.cfg
        To = self.obs_len
        if xy.shape[2] != To + self.pred_len:
            raise ValueError(
                f"loss_variety expects full windows of {To}+{self.pred_len} "
                f"frames, got T={xy.shape[2]}"
            )
        xy_obs, gt = xy[:, :, :To], xy[:, :, To:]
        drop_enc = None
        if drop_key is not None and cfg.dropout > 0.0:
            drop_enc, _ = _dropout_masks(drop_key, cfg, *mask.shape)
        carry = self.encode(params, xy_obs, mask, stats, drop_enc, train=True)
        # remat=True: this is the one differentiated consumer of the rollout
        # scan — without it the backward saves every step's attention
        # residuals for n*B rows and that HBM write/read traffic binds the
        # step (see decode_rollout's docstring for the measured factor).
        # train=True: with the remat, the rollout is a differentiated path
        # like any other, and "auto" attend dispatch pins XLA at every N.
        # (Pre-remat the kernel won this program by ~45% at N=128 because its
        # n*B-row decode amortized the custom_vjp boundary; the remat replays
        # the kernel inside the backward and inverts that — re-measured 83.5
        # vs 93.3 steps/s XLA at N=128 B=32 n=4, plus a 135 s vs 11 s
        # compile.  ARCHITECTURE.md pt 13 has both measurements.)
        preds = self.rollout_k(params, xy_obs, mask, stats, key, n_samples,
                               carry=carry, remat=True,
                               train=True)  # (n, B, N, Tp, 2) meters
        sq = ((preds - gt[None]) ** 2).sum(-1)  # (n, B, N, Tp)
        err = sq.mean(-1)  # (n, B, N)
        if fde_weight > 0.0:
            err = err + jnp.float32(fde_weight) * sq[..., -1]
        best = err.min(axis=0)  # (B, N)
        w = mask.astype(jnp.float32)
        return jnp.sum(best * w) / jnp.maximum(w.sum(), 1.0)

    def rollout_k(self, params: Params, xy_obs, mask, stats: NormStats, key, k: int,
                  carry: Carry = None, sigma_scale: float = 1.0, keys=None,
                  train: bool = False, remat: bool = False,
                  draw_n: int = None):
        """K sampled rollouts, encode once -> (K, B, N, Tp, 2) absolute meters.

        The K modes are folded into the batch dimension (tile, decode once,
        unfold) rather than vmapped: flat (K*B, N, ...) shapes compile to the
        same XLA program a bigger batch would, sampling draws one key per
        step for all K*B graphs, and the Pallas GAT grid is a single flat
        batch axis.  Measured ~15% faster than vmap-over-keys and
        functionally identical (BASELINE.json:5 "vectorized via vmap over
        modes" — this is the same vectorization, one axis flatter).

        ``carry``: pass a precomputed encoder carry to skip the internal
        encode (evaluate() shares one encode between the rollout and the
        teacher-forced NLL).
        ``sigma_scale``: within-component sampling temperature (see
        decode_rollout); 1.0 = untempered protocol.
        ``keys``: optional (B,) per-window keys — each window's sample
        streams then depend on its key alone (`_per_window_stream`), making
        downstream metrics exactly invariant to batch size/padding; ``key``
        is ignored when given.
        ``draw_n``: canonical agent capacity to draw per-window randomness
        at (see `_per_window_stream`) — the shape-bucketing hook; only
        meaningful with ``keys``."""
        B, N = mask.shape
        if carry is None:
            carry = self.encode(params, xy_obs, mask, stats)
        tile = lambda a: jnp.tile(a, (k,) + (1,) * (a.ndim - 1))  # noqa: E731
        carry_k = Carry(h=tile(carry.h), c=tile(carry.c))
        xy_last = tile(xy_obs[:, :, -1])
        mask_k = tile(mask)
        if self.cfg.head == "gmm":
            if keys is not None:
                stream = self._per_window_stream(keys, k, N, sigma_scale,
                                                 draw_n=draw_n)
            else:
                stream = self._rollout_stream(key, k * B, N, sigma_scale)
        else:
            stream = None
        if self.cfg.use_fused_decoder:
            if train or remat:
                raise ValueError(
                    "use_fused_decoder=True cannot serve a differentiated "
                    "rollout (loss=variety/hybrid): the fused Pallas decoder "
                    "defines no VJP and the train/remat flags do not apply to "
                    "it — train with the XLA decode path "
                    "(use_fused_decoder=False)"
                )
            traj = self._decode_fused(params, carry_k, xy_last, mask_k, stats, stream)
        else:
            traj = self.decode_rollout(
                params, carry_k, xy_last, mask_k, stats, None, stream=stream,
                train=train, remat=remat,
            )
        return traj.reshape((k, B) + traj.shape[1:])

    def rollout_modes(self, params: Params, xy_obs, mask, stats: NormStats,
                      carry: Carry = None):
        """One deterministic trajectory per mixture component
        -> (M, B, N, Tp, 2) absolute meters, M = cfg.num_mixtures.

        The alternative multimodal-inference semantics SURVEY.md §2.3 flags
        as unverified in the reference ("one trajectory per mixture mode
        [A — verify which]"): instead of sampling, trajectory m follows
        component m's MEAN offset at every step, enumerating the head's
        modes.  No RNG — repeat-deterministic, so best-of-M eval on this
        path needs no seed protocol.  M is folded into the batch dim
        exactly like rollout_k (block m of the flat batch carries a fixed
        one-hot selecting component m)."""
        cfg = self.cfg
        if cfg.head != "gmm":
            raise ValueError("rollout_modes requires the GMM head")
        M = cfg.num_mixtures
        B, N = mask.shape
        if carry is None:
            carry = self.encode(params, xy_obs, mask, stats)
        tile = lambda a: jnp.tile(a, (M,) + (1,) * (a.ndim - 1))  # noqa: E731
        carry_m = Carry(h=tile(carry.h), c=tile(carry.c))
        xy_last = tile(xy_obs[:, :, -1])
        mask_m = tile(mask)
        # tile() lays out flat row m*B+b as (batch b, copy m); eye-rows
        # repeated B times line up so that row m*B+b selects component m.
        onehot = jnp.repeat(jnp.eye(M, dtype=jnp.float32), B, axis=0)
        onehot = jnp.broadcast_to(onehot[:, None, :], (M * B, N, M))

        def body(state, _):
            carry, xy = state
            out = self._head(params, carry.h)
            dxy_n = jnp.einsum("...m,...md->...d", onehot, out.mu)
            xy_new = xy + denormalize(dxy_n, stats)
            carry = _step(params["dec"], cfg, carry, dxy_n, xy_new, mask_m)
            return (carry, xy_new), xy_new

        _, traj = jax.lax.scan(
            body, (carry_m, xy_last), None, length=self.pred_len,
            unroll=cfg.scan_unroll,
        )
        traj = jnp.moveaxis(traj, 0, 2)  # (M*B, N, Tp, 2)
        return traj.reshape((M, B) + traj.shape[1:])

    def _decode_fused(self, params: Params, carry: Carry, xy_last, mask, stats,
                      stream):
        """Whole-rollout fused Pallas decoder (mmtraj/ops/fused_decoder.py).

        ``stream``: pre-drawn (gumbel, normal) randomness — the same stream
        the XLA path consumes, so both decoders sample identical
        trajectories."""
        from mmtraj.ops.fused_decoder import fused_decode, permute_head

        cfg = self.cfg
        assert cfg.cell == "gru" and cfg.social and cfg.head == "gmm", (
            "fused decoder covers the flagship GRU+social+GMM configuration"
        )
        assert cfg.gat_layers == 1, (
            "fused decoder implements the single-round GAT step; use the "
            "XLA path for gat_layers > 1"
        )
        assert "bh" not in params["dec"]["cell"] and "wh_n" not in params["dec"]["cell"], (
            "fused decoder does not consume the import-only cell params "
            "'bh'/'wh_n' (mmtraj/interop.py); use the XLA path for imported params"
        )
        M = cfg.num_mixtures
        gumbel, normal = stream
        hw, hb = permute_head(params["head"]["w"], params["head"]["b"], M)
        traj = fused_decode(
            carry.h, xy_last, mask, gumbel, normal, params["dec"], hw, hb,
            num_heads=cfg.num_heads, num_mixtures=M, radius=cfg.adjacency_radius,
            sigma_min=cfg.sigma_min, rho_max=cfg.rho_max,
            stats_mean=stats.mean, stats_std=stats.std,
        )
        return jnp.moveaxis(traj, 1, 2)  # (Bk, N, T, 2)
