"""Configuration dataclasses + the BASELINE capability-ladder presets.

The judged capability ladder is BASELINE.json:6-12 (configs 1-5); each preset
below cites the line it implements.  The reference repo uses argparse flags
(SURVEY.md §2.4 [K]); here the equivalent is typed dataclasses with CLI
overrides (mmtraj/cli.py).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

SCENES = ("eth", "hotel", "univ", "zara1", "zara2")


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters for the forecaster family.

    A single configurable model covers the reference's variants
    (SURVEY.md §2.3): ``social=False, cell='lstm', head='deterministic'`` is
    the plain LSTM encoder-decoder (BASELINE.json:7); ``social=True`` adds the
    proximity-graph GAT encoder (BASELINE.json:8); ``head='gmm'`` adds the
    bivariate-Gaussian-mixture multimodal head (BASELINE.json:9);
    ``num_heads>1`` is the dense-crowd multi-head attention variant
    (BASELINE.json:10).
    """

    cell: str = "gru"  # "gru" | "lstm"
    # Observation encoder family (mmtraj/models/forecaster.py::encode):
    #   "rnn"  — the reference lineage: per-agent GRU/LSTM over offsets with
    #            per-frame social GAT refinement (BASELINE.json:5).
    #   "attn" — spatio-temporal attention (mmtraj/models/attn_encoder.py):
    #            causal temporal self-attention per agent interleaved with
    #            the same per-frame social GAT, transformer-style — no
    #            sequential dependency over the 8 obs steps, so the encode
    #            compiles to large batched matmuls instead of a lax.scan
    #            (the STAR/AgentFormer successor family to the reference).
    # The decoder (autoregressive cell + head + rollouts) is shared, so every
    # loss/eval/export path composes with either encoder.
    encoder: str = "rnn"
    attn_layers: int = 2  # transformer blocks when encoder="attn"
    social: bool = True
    num_heads: int = 4
    # Stacked GAT message-passing rounds per frame step (rnn-family encoder
    # AND decoder): each round re-attends over the residual-updated hidden
    # states with the same frame adjacency, widening the social receptive
    # field to gat_layers hops — the dense-crowd depth axis (VERDICT r4 #6).
    # 1 = the reference-parity single round; extra rounds get their own
    # parameters (init_params keys "gat_1", ...).
    gat_layers: int = 1
    embed_dim: int = 64
    hidden_dim: int = 64
    head: str = "gmm"  # "gmm" | "deterministic"
    num_mixtures: int = 5
    # Proximity adjacency radius in meters; <= 0 means fully-connected over
    # co-present agents (BASELINE.json:5 "adjacency from agent XY proximity").
    adjacency_radius: float = 4.0
    sigma_min: float = 1e-3
    rho_max: float = 0.99
    dtype: str = "float32"  # "bfloat16" runs matmuls in bf16 (loss stays f32)
    use_pallas: bool = False  # opt-in fused Pallas GAT kernel (XLA canonical)
    # Attention-chain backend for the GAT score+softmax+aggregate
    # (mmtraj/ops/fused_attend.py): "auto" (default) uses the Pallas kernel
    # on TPU when the graph is lane-filling (N >= 128) where it measured
    # 2.3-2.6x faster end-to-end than the XLA chain, and the XLA chain otherwise
    # (N=64 flagship shapes, where XLA wins — ARCHITECTURE.md pt 12).
    # "auto" is also per-path: ALL differentiated paths pin XLA at every N —
    # teacher-forced training (the kernel loses those grad programs 13-14%)
    # AND the rematted rollout inside loss_variety (the remat replays the
    # kernel in the backward, inverting its pre-remat 45% win: 83.5 vs 93.3
    # XLA steps/s at N=128 — ARCHITECTURE.md pt 13); inference rollouts keep
    # the dense-N kernel.  "xla"/"pallas" pin a backend everywhere.
    attend_kernel: str = "auto"
    # Opt-in fully-fused Pallas rollout decoder (whole 12-step loop in one
    # kernel, mmtraj/ops/fused_decoder.py).  GRU+social+GMM only; consumes the
    # identical pre-drawn random stream as the XLA path, so given the same key
    # it samples trajectory-identical rollouts (pinned by
    # tests/test_fused_decoder.py::test_rollout_k_fused_exact).
    use_fused_decoder: bool = False
    # Variational (per-sequence) dropout rate on the embedding activations and
    # the social-GAT residual during training; 0 disables.  One mask per
    # forward pass reused across all scan steps (Gal & Ghahramani recurrent
    # dropout) — no per-step RNG inside the scan, so the rollout hot path is
    # untouched and eval is always deterministic.
    dropout: float = 0.0
    # Rematerialize scan bodies on the backward pass (jax.checkpoint): skips
    # stashing the (T, B, N, N)-scale attention intermediates for grad,
    # trading recompute FLOPs for HBM traffic/footprint.  Enables much larger
    # batches; measure before enabling for speed (see ARCHITECTURE.md).
    remat: bool = False
    # jax.checkpoint policy when remat=True (ARCHITECTURE.md pt 9 showed the
    # B>=256 windows/s ceiling is recompute-traffic-shaped, so the policy is
    # the knob):
    #   "full"          — save nothing, recompute everything (the r1/r2
    #                     behavior; smallest memory, most recompute);
    #   "dots"          — save every matmul output, recompute only the cheap
    #                     elementwise chain (sigmoid/tanh/softmax);
    #   "dots_no_batch" — save only weight-stationary (non-batch) matmuls.
    remat_policy: str = "full"
    # lax.scan unroll factor for the 8/12-step encoder/decoder time loops.
    # The step is latency-bound (~2% MFU, ARCHITECTURE.md pt 9), so shaving
    # while-loop iteration overhead is the relevant axis; measured table in
    # ARCHITECTURE.md pt 10.  1 = plain scan.
    scan_unroll: int = 1


@dataclass(frozen=True)
class DataConfig:
    data_dir: str = "data/synthetic"
    scene: str = "zara1"  # held-out scene of the 5-scene leave-one-out split
    obs_len: int = 8  # BASELINE.json:7 obs=8
    pred_len: int = 12  # BASELINE.json:7 pred=12
    n_max: int = 32  # padded agent capacity (64 for dense crowds, :10)
    stride: int = 1
    min_agents: int = 1


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 64
    steps: int = 2000
    # Training objective (mmtraj/models/forecaster.py):
    #   "nll"     — teacher-forced GMM NLL (MSE for deterministic heads);
    #               the parity default (SURVEY.md §2.3: loss "[K] standard").
    #   "variety" — Social-GAN-style winner-takes-all: roll out variety_n
    #               sampled futures and backprop only the best (min mean
    #               squared L2) sample per agent — trains the exact
    #               best-of-K contract metric (BASELINE.json:2).
    #   "hybrid"  — nll + variety_weight * variety: WTA shapes the samples
    #               while NLL keeps gradient flowing to the mixture logits
    #               (the WTA component choice is a hard, non-differentiable
    #               selection).
    loss: str = "nll"
    variety_n: int = 8  # WTA rollout samples per step (cost scales with it)
    variety_weight: float = 1.0  # hybrid: weight on the WTA term
    # Extra weight on each sample's FINAL-step squared error inside the WTA
    # min (0 = plain Social-GAN variety).  The plain objective weights all 12
    # steps equally, which trains min-ADE well but leaves min-FDE on the
    # table; this is the WTA analogue of weighting FDE alongside ADE.
    variety_fde_weight: float = 0.0
    lr: float = 1e-3
    # "constant" or "cosine" (linear warmup over `warmup_steps`, cosine decay
    # to lr/100 at `steps`).
    lr_schedule: str = "constant"
    warmup_steps: int = 100
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    # >0 enables an exponential moving average of the params; eval
    # during/after training uses the EMA weights and the trainer writes a
    # deployable `checkpoint_ema.npz` beside the resume checkpoint.  Pick the
    # decay so the horizon 1/(1-d) is ~5-10% of total steps (measured: 0.99
    # at 2500 steps improves FDE ~3%; 0.999 there lags too far and hurts).
    ema_decay: float = 0.0
    # Training-time window augmentation, applied on device inside the jitted
    # step: a random proper rotation per window (and, with flip, a random
    # reflection).  The social graph is unchanged (pairwise distances are
    # rotation-invariant); offsets rotate.  The standard lever against
    # dense-scene overfitting in this repo family's LOO recipes.
    augment_rotate: bool = False
    augment_flip: bool = False
    k_samples: int = 20  # K for best-of-K eval (BASELINE.json:9)
    eval_every: int = 500
    log_every: int = 100
    ckpt_every: int = 0  # 0 = checkpoint only at the end; >0 = periodic+resume
    seed: int = 0
    out_dir: str = "runs/default"
    data_parallel: bool = False  # shard batch over a jax Mesh (BASELINE.json:11)
    # Streaming ingest: keep the window set host-side and double-buffer
    # batches into HBM via prefetch_to_device (mmtraj/data/pipeline.py)
    # instead of materializing the whole padded dataset in HBM.  Identical
    # batch order and loss trajectory to resident mode for a given seed
    # (tested); use for datasets that outgrow HBM.
    stream: bool = False
    # >1 compiles M train steps into ONE XLA program (lax.scan over steps,
    # batches gathered in-program from the HBM-resident window set) so the
    # host pays one dispatch per M steps instead of two per step.  Measured
    # on v5e behind the tunnel: 3.2x steady-state steps/s at the config-3
    # quality-recipe fold shape (120.8 -> 388.9 at M=50, identical final
    # eval metrics), ~0 at the device-bound config-4 B=128 flagship shape —
    # the win is host-dispatch overhead, so it is largest for small/fast
    # steps (RESULTS.md "Multi-step dispatch").  Same batches, same per-step
    # RNG, same data order as =1 (tested allclose; not bit-identical: XLA
    # fuses across step boundaries, reassociating float reductions).
    # Requires resident ingest (stream=False).
    steps_per_dispatch: int = 1


@dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


def config1() -> Config:
    """BASELINE.json:7 — ETH-hotel single scene: plain LSTM encoder-decoder,
    single-mode output, obs=8/pred=12, batch 8."""
    return Config(
        model=ModelConfig(cell="lstm", social=False, head="deterministic", num_heads=1),
        data=DataConfig(scene="hotel", n_max=24),
        train=TrainConfig(batch_size=8, k_samples=1),
    )


def config2() -> Config:
    """BASELINE.json:8 — 5-scene leave-one-out: social graph-attention encoder
    + GRU decoder, deterministic output."""
    return Config(
        model=ModelConfig(cell="gru", social=True, head="deterministic", num_heads=1,
                          remat=True),
        data=DataConfig(scene="zara1", n_max=32),
        train=TrainConfig(batch_size=32, k_samples=1),
    )


def config3() -> Config:
    """BASELINE.json:9 — multimodal K=20 bivariate-Gaussian-mixture decoder
    with best-of-K ADE/FDE eval, masked variable agent counts."""
    return Config(
        model=ModelConfig(cell="gru", social=True, head="gmm", num_heads=1, remat=True),
        data=DataConfig(scene="zara1", n_max=32),
        train=TrainConfig(batch_size=32, k_samples=20),
    )


def config4() -> Config:
    """BASELINE.json:10 — multi-head graph attention over dense crowds
    (UCY-univ, 50+ agents/frame) with padded fixed-shape graphs."""
    return Config(
        model=ModelConfig(cell="gru", social=True, head="gmm", num_heads=4, remat=True),
        data=DataConfig(scene="univ", n_max=64),
        train=TrainConfig(batch_size=16, k_samples=20),
    )


def config5() -> Config:
    """BASELINE.json:11 — large-batch multi-scene training: vmapped padded
    social graphs + streaming loader, data-parallel over a v4-8/v5e-8 mesh.

    The ingest stays HBM-resident (`stream=False`) deliberately: the
    streaming loader exists and is tested (`--stream`,
    mmtraj/data/pipeline.py), but measured on v5e it sustains only
    ~0.21-0.24x the resident step rate at this batch (the per-batch
    host->HBM transfer latency cannot hide behind a ~10 ms step; depth
    sweep + numbers in RESULTS.md "Streaming ingest at scale").  ETH/UCY-
    scale window sets are a few hundred MB at most, so residency is free;
    flip `--stream` only when the dataset genuinely outgrows HBM."""
    return Config(
        model=ModelConfig(cell="gru", social=True, head="gmm", num_heads=4, remat=True),
        data=DataConfig(scene="univ", n_max=64),
        train=TrainConfig(batch_size=256, k_samples=20, data_parallel=True),
    )


PRESETS = {
    "1": config1,
    "2": config2,
    "3": config3,
    "4": config4,
    "5": config5,
    "config1": config1,
    "config2": config2,
    "config3": config3,
    "config4": config4,
    "config5": config5,
}


def get_config(name: str) -> Config:
    if name not in PRESETS:
        raise KeyError(f"unknown config preset {name!r}; choose from 1..5")
    return PRESETS[name]()
