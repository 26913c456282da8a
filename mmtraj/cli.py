"""Public train/eval entry points (BASELINE.json:5; SURVEY.md §1 L5).

Usage:
  python -m mmtraj.cli train --config 3 --scene zara1 --data-dir data/synthetic
  python -m mmtraj.cli eval  --ckpt runs/x/checkpoint.npz --data-dir data/synthetic
  python -m mmtraj.cli generate-data --data-dir data/synthetic

Root-level wrappers `train.py` / `evaluate.py` mirror the research-repo-family
convention (SURVEY.md §2.4 [K]; the reference's exact argv surface is unknown
— its mount was empty, SURVEY.md §0).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

from mmtraj.config import SCENES, get_config


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data-dir", default=None, help="annotation dir ({scene}.txt files)")
    p.add_argument("--scene", default=None, choices=SCENES + ("all",),
                   help="held-out scene; 'all' (train only) runs the full "
                        "5-fold leave-one-out protocol and reports the average")
    p.add_argument("--k", type=int, default=None, help="K samples for best-of-K eval")
    p.add_argument("--obs-len", type=int, default=None)
    p.add_argument("--pred-len", type=int, default=None)
    p.add_argument("--n-max", type=int, default=None, help="padded agent capacity")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="mmtraj", description=__doc__)
    from mmtraj import __version__

    ap.add_argument("--version", action="version", version=f"mmtraj {__version__}")
    sub = ap.add_subparsers(dest="cmd", required=True)

    tp = sub.add_parser("train", help="train a forecaster")
    tp.add_argument("--config", default="3", help="preset 1..5 (BASELINE ladder)")
    _add_common(tp)
    tp.add_argument("--steps", type=int, default=None)
    tp.add_argument("--batch-size", type=int, default=None)
    tp.add_argument("--lr", type=float, default=None)
    tp.add_argument("--lr-schedule", default=None, choices=("constant", "cosine"))
    tp.add_argument("--warmup-steps", type=int, default=None,
                    help="linear LR warmup steps for --lr-schedule cosine")
    tp.add_argument("--ema-decay", type=float, default=None,
                    help=">0 enables EMA weights for eval + checkpoint_ema.npz")
    tp.add_argument("--dropout", type=float, default=None,
                    help="variational dropout rate on embed/GAT activations")
    tp.add_argument("--num-mixtures", type=int, default=None,
                    help="GMM head mixture components (default 5)")
    tp.add_argument("--encoder", default=None, choices=("rnn", "attn"),
                    help="observation encoder family: 'rnn' (reference "
                         "lineage: GRU/LSTM + per-frame social GAT) or "
                         "'attn' (spatio-temporal attention: causal temporal "
                         "self-attention per agent interleaved with the same "
                         "per-frame GAT — mmtraj/models/attn_encoder.py)")
    tp.add_argument("--attn-layers", type=int, default=None,
                    help="transformer blocks for --encoder attn (default 2)")
    tp.add_argument("--social", dest="social", action="store_true",
                    default=None,
                    help="enable the per-frame social GAT (presets 2-5 "
                         "default on; see --no-social)")
    tp.add_argument("--no-social", dest="social", action="store_false",
                    help="ablate the social graph: per-agent recurrence "
                         "only, no GAT message passing (BASELINE.json:5's "
                         "defining mechanism — this flag measures what it "
                         "buys; RESULTS.md 'Social-graph ablation')")
    tp.add_argument("--gat-layers", type=int, default=None,
                    help="stacked GAT message-passing rounds per frame "
                         "(default 1 = reference parity; dense-crowd depth "
                         "axis)")
    tp.add_argument("--num-heads", type=int, default=None,
                    help="GAT attention heads (preset 3: 1; preset 4/5: 4)")
    tp.add_argument("--adjacency-radius", type=float, default=None,
                    help="proximity-graph radius in meters; <=0 means "
                         "fully connected over co-present agents")
    tp.add_argument("--hidden-dim", type=int, default=None,
                    help="cell/GAT hidden width (default 64)")
    tp.add_argument("--remat-policy", default=None,
                    choices=("full", "dots", "dots_no_batch"),
                    help="jax.checkpoint policy for remat presets (what the "
                         "backward pass recomputes vs reads from HBM)")
    tp.add_argument("--attend-kernel", default=None,
                    choices=("auto", "xla", "pallas"),
                    help="GAT attention-chain backend: auto (default) picks "
                         "the Pallas kernel on TPU at N>=128 where it "
                         "measured 2.6x faster end-to-end, XLA otherwise")
    tp.add_argument("--weight-decay", type=float, default=None,
                    help="AdamW decoupled weight decay")
    tp.add_argument("--loss", default=None, choices=("nll", "variety", "hybrid"),
                    help="training objective: teacher-forced nll (parity "
                         "default), Social-GAN-style winner-takes-all "
                         "'variety' (trains best-of-K directly), or "
                         "'hybrid' = nll + variety-weight * variety")
    tp.add_argument("--variety-n", type=int, default=None,
                    help="WTA rollout samples per training step (default 8)")
    tp.add_argument("--variety-weight", type=float, default=None,
                    help="hybrid loss: weight on the WTA term (default 1.0)")
    tp.add_argument("--variety-fde-weight", type=float, default=None,
                    help="extra weight on each sample's final-step squared "
                         "error inside the WTA min (default 0 = plain "
                         "Social-GAN variety; targets min-FDE directly)")
    tp.add_argument("--augment", action="store_true",
                    help="random per-window rotation augmentation (on device)")
    tp.add_argument("--augment-flip", action="store_true",
                    help="also randomly reflect windows (implies --augment math)")
    tp.add_argument("--seed", type=int, default=None)
    tp.add_argument("--seeds", type=int, nargs="+", default=None,
                    help="run the whole protocol once per seed and report "
                         "mean±std (e.g. --seeds 0 1 2); with --scene all "
                         "this is the full multi-seed leave-one-out table")
    tp.add_argument("--vmap-seeds", action="store_true",
                    help="train the --seeds sweep as ONE vmapped population "
                         "program (mmtraj/population.py): every seed's run "
                         "advances per train step in a single XLA dispatch. "
                         "Same per-seed math/data/RNG as sequential runs "
                         "(tested), same s{seed}/ checkpoint tree; periodic "
                         "eval is deferred to the end (use eval-loo). "
                         "Requires resident single-device training")
    tp.add_argument("--out-dir", default=None)
    tp.add_argument("--eval-every", type=int, default=None)
    tp.add_argument("--data-parallel", action="store_true")
    tp.add_argument("--stream", action="store_true",
                    help="host-side streaming ingest with double-buffered "
                         "prefetch to HBM (for datasets that outgrow HBM)")
    tp.add_argument("--steps-per-dispatch", type=int, default=None,
                    help="compile M train steps into one XLA program (scan + "
                         "in-program batch gather from the HBM-resident "
                         "window set); same batches/RNG/data order as 1, "
                         "measured 3.2x steps/s at the config-3 fold shape "
                         "(requires resident ingest, i.e. not --stream)")
    tp.add_argument("--synthetic", action="store_true",
                    help="generate synthetic data into --data-dir first")
    tp.add_argument("--resume", action="store_true",
                    help="resume from {out-dir}/checkpoint.npz if present")
    tp.add_argument("--ckpt-every", type=int, default=None,
                    help="periodic checkpoint interval in steps (enables resume)")
    tp.add_argument("--profile", action="store_true",
                    help="write a jax.profiler trace to {out-dir}/profile")
    tp.add_argument("--debug-nans", action="store_true",
                    help="raise on first NaN in any jitted op (slow)")
    tp.add_argument("--tensorboard", action="store_true",
                    help="mirror metrics as TensorBoard scalars to {out-dir}/tb")

    ep = sub.add_parser("eval", help="evaluate a checkpoint (best-of-K ADE/FDE)")
    ep.add_argument("--ckpt", required=True)
    _add_common(ep)
    ep.add_argument("--batch-size", type=int, default=None,
                    help="eval batch; default auto-sizes so the attention "
                         "working set stays VMEM-resident (fastest, see "
                         "evaluate.vmem_friendly_batch)")
    ep.add_argument("--seed", type=int, default=0)
    ep.add_argument("--sigma-scale", type=float, default=1.0,
                    help="GMM sampling temperature (<1 concentrates samples "
                         "near component means; 1.0 = untempered protocol; "
                         "tempered results carry sigma_scale in the metrics)")
    ep.add_argument("--oversample", type=int, default=1,
                    help="sample R=oversample*K rollouts and keep the K most "
                         "endpoint-diverse per agent (sample-and-select; "
                         "1 = plain i.i.d. K, the default protocol)")
    ep.add_argument("--tta", type=int, default=1,
                    help="pool candidates from N orthogonal test-time-"
                         "augmentation views (rotations + reflections; a "
                         "weight-shared pseudo-ensemble) then select back "
                         "to K; 1 = none, the default protocol")
    ep.add_argument("--rollout", default="sample", choices=("sample", "modes"),
                    help="'sample': K sampled rollouts (protocol); 'modes': "
                         "one deterministic trajectory per mixture component "
                         "(best-of-M, M=num_mixtures, no RNG)")
    ep.add_argument("--data-parallel", action="store_true",
                    help="shard eval batches over all local devices")
    ep.add_argument("--reduction", default="per_agent",
                    choices=("per_agent", "per_window"),
                    help="best-of-K protocol: min over K per agent (default) "
                         "or one joint k per window")
    ep.add_argument("--dtype", default=None, choices=("float32", "bfloat16"),
                    help="override the model compute dtype at eval time "
                         "(bf16 matmul quality/throughput trade, RESULTS.md)")
    ep.add_argument("--buckets", type=int, nargs="+", default=None,
                    help="agent-capacity shape buckets (e.g. 16 32 64): each "
                         "window runs in the smallest compiled capacity that "
                         "holds its agents instead of full n_max padding; "
                         "metrics are exactly the padded protocol's "
                         "(evaluate() docstring)")
    ep.add_argument("--auto-n-max", action="store_true",
                    help="raise n_max to the densest test window so no agent "
                         "is dropped from the metric population")

    lp = sub.add_parser(
        "eval-loo",
        help="evaluate a train --scene all checkpoint tree (one process, "
             "per-scene mean±std table over seeds)",
    )
    lp.add_argument("--loo-dir", required=True, nargs="+",
                    help="the --out-dir given to train --scene all; contains "
                         "{scene}/ (single seed) or s{seed}/{scene}/ subdirs. "
                         "Several trees (e.g. different encoder families or "
                         "recipes) may be given WITH --ensemble: each fold "
                         "pools every tree's per-seed checkpoints into one "
                         "heterogeneous deep ensemble (evaluate_mixed)")
    lp.add_argument("--seeds", type=int, nargs="+", default=None,
                    help="seeds to aggregate (default: auto-detect layout)")
    lp.add_argument("--ema", action="store_true",
                    help="evaluate checkpoint_ema.npz instead of checkpoint.npz")
    lp.add_argument("--seed", type=int, default=0, help="eval sampling seed")
    lp.add_argument("--oversample", type=int, default=1)
    lp.add_argument("--tta", type=int, default=1,
                    help="orthogonal test-time-augmentation views per member "
                         "(see eval --tta)")
    lp.add_argument("--ensemble", action="store_true",
                    help="pool each fold's per-seed checkpoints into one "
                         "deep ensemble: all seeds' rollouts become the "
                         "candidate pool and endpoint-diverse selection "
                         "submits K, so the protocol stays best-of-K "
                         "(one row per scene instead of mean±std)")
    lp.add_argument("--sigma-scale", type=float, default=1.0)
    lp.add_argument("--dtype", default=None, choices=("float32", "bfloat16"),
                    help="override the model compute dtype at eval time")
    lp.add_argument("--buckets", type=int, nargs="+", default=None,
                    help="agent-capacity shape buckets (see eval --buckets)")
    lp.add_argument("--reduction", default="per_agent",
                    choices=("per_agent", "per_window"))
    lp.add_argument("--rollout", default="sample", choices=("sample", "modes"))

    bp = sub.add_parser(
        "baseline",
        help="closed-form baseline ADE/FDE on the held-out scene (no model)",
    )
    _add_common(bp)
    bp.add_argument("--baseline", default="cv", choices=("cv", "zv"),
                    help="cv: constant velocity (the standard anchor); "
                         "zv: zero velocity (freeze at last position)")

    gp = sub.add_parser("generate-data", help="write the synthetic ETH/UCY-format dataset")
    gp.add_argument("--data-dir", required=True)
    gp.add_argument("--seed", type=int, default=0)
    gp.add_argument("--n-frames", type=int, default=600)

    vp = sub.add_parser("visualize", help="render K-sample predictions to a PNG")
    vp.add_argument("--ckpt", required=True)
    _add_common(vp)
    vp.add_argument("--out", default="predictions.png")
    vp.add_argument("--windows", type=int, default=6)
    vp.add_argument("--seed", type=int, default=0)

    cp = sub.add_parser(
        "convert",
        help="convert a checkpoint between formats (orbax dir / .npz / .pt / .h5)",
    )
    cp.add_argument("--src", required=True, help="source checkpoint path")
    cp.add_argument("--dst", required=True,
                    help="destination path; suffix selects the format")
    cp.add_argument("--keras", action="store_true",
                    help="treat .h5 files as the legacy Keras save_weights "
                         "layout (reference-convention layer names, "
                         "mmtraj/interop.py) instead of mmtraj's flat h5; "
                         "weights only — --src then needs a --config/--ckpt "
                         "donor for stats+config via --like")
    cp.add_argument("--like", default=None,
                    help="with --keras --src: checkpoint supplying the "
                         "config and norm stats the Keras weights belong to")

    op = sub.add_parser(
        "import-obsmat",
        help="convert a raw BIWI/ETH obsmat (.txt/.mat) to canonical "
             "annotation txt (frame id x y)",
    )
    op.add_argument("--src", required=True, help="obsmat.txt or obsmat.mat")
    op.add_argument("--dst", required=True,
                    help="output path (e.g. data/real/eth.txt)")

    vs = sub.add_parser(
        "import-vsp",
        help="convert a raw UCY .vsp spline annotation (univ/zara) to "
             "canonical annotation txt via a pixel->meter homography",
    )
    vs.add_argument("--src", required=True, help="crowds .vsp file")
    vs.add_argument("--dst", required=True,
                    help="output path (e.g. data/real/zara1.txt)")
    vs.add_argument("--homography", default=None,
                    help="3x3 pixel->meter homography file (plain text, the "
                         "form the UCY H matrices ship in)")
    vs.add_argument("--scale", type=float, default=None,
                    help="meters per pixel (axis-aligned fallback when no "
                         "homography is available)")
    vs.add_argument("--frame-step", type=int, default=10,
                    help="annotation frame grid (default every 10th video "
                         "frame = 0.4 s)")

    at = sub.add_parser(
        "autotune-eval",
        help="measure the fastest eval batch size on THIS chip (replaces the "
             "v5e-calibrated analytic constant with a measurement; pass the "
             "winner as eval --batch-size)",
    )
    at.add_argument("--ckpt", required=True)
    at.add_argument("--k", type=int, default=None)
    at.add_argument("--iters", type=int, default=20)
    at.add_argument("--batches", type=int, nargs="+", default=None,
                    help="candidate batch sizes to time (default: an "
                         "8-point bracket around the analytic guess)")

    cc = sub.add_parser("cache",
                        help="persistent XLA compile cache: show size, trim, clear")
    cc.add_argument("--clear", action="store_true",
                    help="remove every cache entry")
    cc.add_argument("--trim-gb", type=float, default=None,
                    help="evict LRU entries until the cache is under this "
                         "many GB (default policy: MMTRAJ_COMPILE_CACHE_MAX_GB, "
                         "else 4)")

    pp = sub.add_parser("profile-stats",
                        help="summarize a jax.profiler trace (device-time op stats)")
    pp.add_argument("--trace-dir", required=True,
                    help="dir containing *.xplane.pb (e.g. {out-dir}/profile)")
    pp.add_argument("--top", type=int, default=15)

    xp = sub.add_parser("export",
                        help="export a frozen K-sample predictor as StableHLO")
    xp.add_argument("--ckpt", required=True)
    xp.add_argument("--out", required=True, help="output .stablehlo file")
    xp.add_argument("--batch", type=int, default=64)
    xp.add_argument("--k", type=int, default=None)
    xp.add_argument("--platform", default=None,
                    help="lowering target (default: current backend)")
    xp.add_argument("--oversample", type=int, default=1,
                    help="bake sample-and-select into the frozen graph "
                         "(draw R*K, return the K most diverse per agent)")

    sv = sub.add_parser(
        "serve",
        help="serve an exported predictor: JSON-lines requests on stdin -> "
             "K-sample rollouts on stdout (protocol in mmtraj/serve.py)")
    sv.add_argument("--artifact", required=True, nargs="+",
                    help="StableHLO file(s) written by `export`; several = "
                         "graduated capacities, each request routed to the "
                         "smallest artifact that holds it (shape buckets)")
    sv.add_argument("--aggregate", type=int, default=1,
                    help="micro-batch up to N consecutive single-window "
                         "same-seed requests into one device call (serve_bench: "
                         "sustained throughput peaks near the VMEM-optimal "
                         "batch; semantics = client-side batching)")
    sv.add_argument("--window-ms", type=float, default=5.0,
                    help="max wait for the first request of a group to gather "
                         "company (only with --aggregate > 1)")
    sv.add_argument("--stats-every", type=int, default=0,
                    help="log one operational line (ok/err counts, qps, mean "
                         "group size) to stderr every N answered requests")
    sv.add_argument("--no-pipeline-encode", action="store_true",
                    help="serialize response encoding with device calls "
                         "(debug escape hatch; default overlaps them on a "
                         "writer thread, same bytes/order)")

    rp = sub.add_parser("predict",
                        help="sample K futures for a scene's live windows -> .npz")
    rp.add_argument("--ckpt", required=True)
    _add_common(rp)
    rp.add_argument("--out", default="predictions.npz")
    rp.add_argument("--seed", type=int, default=0)
    rp.add_argument("--oversample", type=int, default=1,
                    help="sample R=oversample*K futures and keep the K most "
                         "endpoint-diverse per agent (see eval --oversample)")
    rp.add_argument("--batch-size", type=int, default=None,
                    help="default auto-sizes to keep attention VMEM-resident")
    rp.add_argument("--auto-n-max", action="store_true",
                    help="raise n_max to the densest window so no agent is dropped")
    return ap


def _load_eval_dataset(cfg, auto_n_max: bool, context: str):
    """Load the held-out scene as a WindowDataset, with the shared
    auto-n-max raise + overflow warning (eval and predict paths)."""
    from mmtraj.data.collate import WindowDataset
    from mmtraj.data.registry import load_scene_windows

    windows = load_scene_windows(
        cfg.data.data_dir, cfg.data.scene, cfg.data.obs_len, cfg.data.pred_len,
        cfg.data.stride, cfg.data.min_agents,
    )
    n_max = cfg.data.n_max
    densest = max((w.shape[0] for w in windows), default=0)
    if auto_n_max and densest > n_max:
        print(f"auto-n-max: raising n_max {n_max} -> {densest} "
              "(densest window) so no agent is dropped")
        n_max = densest
    ds = WindowDataset(windows, n_max)
    if ds.n_dropped:
        print(f"WARNING: {ds.n_dropped} agents exceed n_max={n_max} and are "
              f"excluded from {context} (use --auto-n-max)")
    return ds, n_max


def _vmap_seeds_guard(parser, args) -> None:
    """--vmap-seeds preconditions (mmtraj/population.py scope), surfaced as
    parser errors before any data/model work."""
    if args.seeds is None or len(args.seeds) < 2:
        parser.error("--vmap-seeds requires --seeds with >= 2 seeds")
    if args.resume:
        parser.error("--vmap-seeds does not support --resume")
    if args.stream:
        parser.error("--vmap-seeds requires resident ingest (drop --stream)")
    # --data-parallel composes with --vmap-seeds (vmap inside pjit; parity
    # pinned in tests/test_population.py) — no guard needed.
    if getattr(args, "tensorboard", False):
        parser.error("--vmap-seeds does not write per-seed TensorBoard "
                     "traces (drop --tensorboard; JSONL metrics are still "
                     "written, with per-seed loss rows)")
    if getattr(args, "profile", None):
        parser.error("--vmap-seeds does not support --profile (the S-seed "
                     "program interleaves all seeds; profile a single-seed "
                     "run instead)")


def _print_loo_seed_table(args, seeds, per_seed) -> None:
    """The multi-seed leave-one-out table: per-scene mean±std over seeds,
    shared by the sequential and --vmap-seeds protocol drivers."""
    import statistics as _st

    print(f"\nleave-one-out (config {args.config}, "
          f"{len(seeds)} seeds {seeds}): mean ± std over seeds")
    print(f"{'scene':8s} {'ADE(m)':>16s} {'FDE(m)':>16s}")
    avg_a, avg_f = [], []
    for i, scene in enumerate(SCENES):
        a = [_nan(rows[i][1]) for rows in per_seed]
        f = [_nan(rows[i][2]) for rows in per_seed]
        print(f"{scene:8s} {_st.mean(a):8.4f}±{_st.stdev(a):6.4f} "
              f"{_st.mean(f):8.4f}±{_st.stdev(f):6.4f}")
    for rows in per_seed:
        avg_a.append(sum(_nan(r[1]) for r in rows) / len(rows))
        avg_f.append(sum(_nan(r[2]) for r in rows) / len(rows))
    k_any = next(
        (r[3] for rows in per_seed for r in rows if r[1] is not None),
        None,
    )
    print(f"{'AVG':8s} {_st.mean(avg_a):8.4f}±{_st.stdev(avg_a):6.4f} "
          f"{_st.mean(avg_f):8.4f}±{_st.stdev(avg_f):6.4f} "
          f"(best-of-{k_any})")


def _nan(x):
    """None (a fold with nothing to eval) -> NaN so tables print instead of
    crashing after all folds trained."""
    return float("nan") if x is None else x


def _apply_overrides(cfg, args):
    model, data, train = cfg.model, cfg.data, cfg.train
    dk = {k: v for k, v in {
        "data_dir": args.data_dir, "scene": args.scene,
        "obs_len": args.obs_len, "pred_len": args.pred_len, "n_max": args.n_max,
    }.items() if v is not None}
    tk = {k: v for k, v in {
        "steps": getattr(args, "steps", None), "batch_size": getattr(args, "batch_size", None),
        "lr": getattr(args, "lr", None), "seed": getattr(args, "seed", None),
        "lr_schedule": getattr(args, "lr_schedule", None),
        "warmup_steps": getattr(args, "warmup_steps", None),
        "ema_decay": getattr(args, "ema_decay", None),
        "out_dir": getattr(args, "out_dir", None), "k_samples": args.k,
        "eval_every": getattr(args, "eval_every", None),
        "ckpt_every": getattr(args, "ckpt_every", None),
        "weight_decay": getattr(args, "weight_decay", None),
        "loss": getattr(args, "loss", None),
        "variety_n": getattr(args, "variety_n", None),
        "variety_weight": getattr(args, "variety_weight", None),
        "variety_fde_weight": getattr(args, "variety_fde_weight", None),
        "steps_per_dispatch": getattr(args, "steps_per_dispatch", None),
    }.items() if v is not None}
    if getattr(args, "data_parallel", False):
        tk["data_parallel"] = True
    if getattr(args, "stream", False):
        tk["stream"] = True
    if getattr(args, "augment", False):
        tk["augment_rotate"] = True
    if getattr(args, "augment_flip", False):
        tk["augment_rotate"] = True
        tk["augment_flip"] = True
    mk = {}
    if getattr(args, "dropout", None) is not None:
        mk["dropout"] = args.dropout
    if getattr(args, "num_mixtures", None) is not None:
        mk["num_mixtures"] = args.num_mixtures
    if getattr(args, "hidden_dim", None) is not None:
        mk["hidden_dim"] = args.hidden_dim
    if getattr(args, "social", None) is not None:
        mk["social"] = args.social
    if getattr(args, "num_heads", None) is not None:
        mk["num_heads"] = args.num_heads
    if getattr(args, "gat_layers", None) is not None:
        mk["gat_layers"] = args.gat_layers
    if getattr(args, "dtype", None) is not None:
        mk["dtype"] = args.dtype
    if getattr(args, "adjacency_radius", None) is not None:
        mk["adjacency_radius"] = args.adjacency_radius
    if getattr(args, "encoder", None) is not None:
        mk["encoder"] = args.encoder
    if getattr(args, "attn_layers", None) is not None:
        mk["attn_layers"] = args.attn_layers
    if getattr(args, "remat_policy", None) is not None:
        mk["remat_policy"] = args.remat_policy
    if getattr(args, "attend_kernel", None) is not None:
        mk["attend_kernel"] = args.attend_kernel
    return cfg.replace(
        model=dataclasses.replace(model, **mk),
        data=dataclasses.replace(data, **dk),
        train=dataclasses.replace(train, **tk),
    )


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)

    # Persistent XLA compile cache, on by default for every subcommand (the
    # flagship eval program compiles in minutes cold, seconds warm).  Control
    # with MMTRAJ_COMPILE_CACHE=<dir>|off (utils/compile_cache.py explains
    # why this must be config.update, not env vars, on this machine).
    from mmtraj.utils.compile_cache import enable_compile_cache

    enable_compile_cache()


    if getattr(args, "scene", None) == "all" and args.cmd not in ("train", "baseline"):
        parser.error("--scene all (5-fold leave-one-out) is train/baseline-only")

    if args.cmd == "generate-data":
        from mmtraj.data.synthetic import write_synthetic_dataset

        write_synthetic_dataset(args.data_dir, args.seed, args.n_frames)
        print(f"wrote synthetic scenes {SCENES} to {args.data_dir}")
        return 0

    if args.cmd == "train" and args.scene == "all":
        # Full 5-scene leave-one-out protocol (BASELINE.json:8): one fold per
        # held-out scene, then the canonical per-scene table + average.  With
        # --seeds the whole protocol repeats per seed and the table reports
        # mean±std over seeds (the publication-grade variant; RESULTS.md).
        from mmtraj.train import fit
        from mmtraj.utils.profiling import enable_nan_debugging, trace_ctx

        if args.debug_nans:
            enable_nan_debugging()
        seeds = args.seeds if args.seeds else [args.seed]
        base_out = args.out_dir
        if args.vmap_seeds:
            _vmap_seeds_guard(parser, args)
            from mmtraj.population import fit_population

            per_seed = [[] for _ in seeds]
            for scene in SCENES:
                args.scene = scene
                args.seed = seeds[0]
                args.out_dir = base_out
                cfg = _apply_overrides(get_config(args.config), args)
                out = cfg.train.out_dir
                outs = [f"{out}/s{s}/{scene}" for s in seeds]
                if args.synthetic and scene == SCENES[0]:
                    from mmtraj.data.synthetic import write_synthetic_dataset

                    write_synthetic_dataset(cfg.data.data_dir, cfg.train.seed)
                results = fit_population(cfg, seeds, out_dirs=outs)
                for i, r in enumerate(results):
                    m = r.eval_metrics or {}
                    per_seed[i].append(
                        (scene, m.get("min_ade"), m.get("min_fde"), m.get("k"))
                    )
                print(f"scene={scene}: trained population of {len(seeds)} "
                      f"seeds in one program", flush=True)
            _print_loo_seed_table(args, seeds, per_seed)
            return 0

        def run_loo_once(seed):
            rows = []
            for scene in SCENES:
                args.scene = scene
                args.seed = seed
                cfg = _apply_overrides(get_config(args.config), args)
                out = cfg.train.out_dir
                sub = f"{out}/{scene}" if len(seeds) == 1 else f"{out}/s{seed}/{scene}"
                cfg = cfg.replace(train=dataclasses.replace(cfg.train, out_dir=sub))
                if args.synthetic and scene == SCENES[0] and seed == seeds[0]:
                    from mmtraj.data.synthetic import write_synthetic_dataset

                    write_synthetic_dataset(cfg.data.data_dir, cfg.train.seed)
                logger = None
                if args.tensorboard:
                    from mmtraj.utils.logging import MetricsLogger

                    logger = MetricsLogger(cfg.train.out_dir, tensorboard=True)
                with trace_ctx(cfg.train.out_dir, enabled=args.profile):
                    result = fit(cfg, resume=args.resume, logger=logger)
                m = result.eval_metrics or {}
                rows.append((scene, m.get("min_ade"), m.get("min_fde"), m.get("k")))
            return rows

        per_seed = []
        for seed in seeds:
            args.out_dir = base_out
            rows = run_loo_once(seed)
            per_seed.append(rows)
            if len(seeds) > 1:
                print(f"\nseed {seed} leave-one-out (config {args.config}):")
                for scene, a, f, _ in rows:
                    # a/f are None when a fold had no test windows to eval.
                    print(f"  {scene:8s} {_nan(a):8.4f} {_nan(f):8.4f}")

        if len(seeds) == 1:
            rows = per_seed[0]
            print(f"\nleave-one-out (config {args.config}):")
            print(f"{'scene':8s} {'ADE(m)':>8s} {'FDE(m)':>8s}")
            ades = [a for _, a, _, _ in rows if a is not None]
            fdes = [f for _, _, f, _ in rows if f is not None]
            for scene, a, f, k in rows:
                print(f"{scene:8s} {_nan(a):8.4f} {_nan(f):8.4f}")
            if ades:
                k_any = next(k for _, a, _, k in rows if a is not None)
                print(f"{'AVG':8s} {sum(ades)/len(ades):8.4f} "
                      f"{sum(fdes)/len(fdes):8.4f} (best-of-{k_any})")
        else:
            _print_loo_seed_table(args, seeds, per_seed)
        return 0

    if args.cmd == "train":
        from mmtraj.train import fit
        from mmtraj.utils.profiling import enable_nan_debugging, trace_ctx

        if args.debug_nans:
            enable_nan_debugging()
        seeds = args.seeds if args.seeds else [args.seed]
        base_out = args.out_dir
        finals = []
        if args.vmap_seeds:
            _vmap_seeds_guard(parser, args)
            from mmtraj.population import fit_population

            args.seed = seeds[0]
            cfg = _apply_overrides(get_config(args.config), args)
            if args.synthetic:
                from mmtraj.data.synthetic import write_synthetic_dataset

                write_synthetic_dataset(cfg.data.data_dir, cfg.train.seed)
            for seed, result in zip(seeds, fit_population(cfg, seeds)):
                if result.eval_metrics:
                    finals.append(result.eval_metrics)
                    print(f"final (seed {seed}): "
                          f"best-of-{result.eval_metrics['k']} "
                          f"ADE={result.eval_metrics['min_ade']:.4f}m "
                          f"FDE={result.eval_metrics['min_fde']:.4f}m")
        for seed in ([] if args.vmap_seeds else seeds):
            args.seed = seed
            args.out_dir = base_out
            cfg = _apply_overrides(get_config(args.config), args)
            if len(seeds) > 1:
                cfg = cfg.replace(train=dataclasses.replace(
                    cfg.train, out_dir=f"{cfg.train.out_dir}/s{seed}"))
            if args.synthetic and seed == seeds[0]:
                from mmtraj.data.synthetic import write_synthetic_dataset

                write_synthetic_dataset(cfg.data.data_dir, cfg.train.seed)
            logger = None
            if args.tensorboard:
                from mmtraj.utils.logging import MetricsLogger

                logger = MetricsLogger(cfg.train.out_dir, tensorboard=True)
            with trace_ctx(cfg.train.out_dir, enabled=args.profile):
                result = fit(cfg, resume=args.resume, logger=logger)
            if result.eval_metrics:
                finals.append(result.eval_metrics)
                print(
                    f"final{f' (seed {seed})' if len(seeds) > 1 else ''}: "
                    f"best-of-{result.eval_metrics['k']} "
                    f"ADE={result.eval_metrics['min_ade']:.4f}m "
                    f"FDE={result.eval_metrics['min_fde']:.4f}m"
                )
        if len(finals) > 1:
            import statistics as _st

            a = [m["min_ade"] for m in finals]
            f = [m["min_fde"] for m in finals]
            print(f"over {len(finals)} seeds: "
                  f"ADE={_st.mean(a):.4f}±{_st.stdev(a):.4f}m "
                  f"FDE={_st.mean(f):.4f}±{_st.stdev(f):.4f}m")
        return 0

    if args.cmd == "eval":
        from mmtraj import checkpoint as ckpt_lib
        from mmtraj.evaluate import evaluate
        from mmtraj.models.forecaster import Forecaster

        ck = ckpt_lib.load(args.ckpt)
        params, stats, step = ck.params, ck.stats, ck.step
        cfg = _apply_overrides(ck.config, args)
        ds, _ = _load_eval_dataset(cfg, args.auto_n_max, "the metric population")
        model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
        mesh = None
        if args.data_parallel:
            from mmtraj.parallel.mesh import make_mesh

            mesh = make_mesh()
        m = evaluate(model, params, stats, ds, cfg.train.k_samples, args.batch_size,
                     args.seed, mesh=mesh, reduction=args.reduction,
                     sigma_scale=args.sigma_scale, rollout=args.rollout,
                     oversample=args.oversample, tta=args.tta,
                     buckets=args.buckets)
        red = m["reduction"] + (", modes" if args.rollout == "modes" else "")
        print(
            f"scene={cfg.data.scene} step={step} windows={m['n_windows']} "
            f"agents={m['n_agents']} dropped={m['n_dropped']}: "
            f"best-of-{m['k']} ({red}) "
            f"ADE={m['min_ade']:.4f}m FDE={m['min_fde']:.4f}m "
            f"MR@2m={m['miss_rate_2m']:.3f} coll@0.2m={m['collision_rate']:.3f}"
        )
        return 0

    if args.cmd == "import-obsmat":
        from mmtraj.data.obsmat import convert_obsmat

        n = convert_obsmat(args.src, args.dst)
        print(f"wrote {n} rows: {args.src} -> {args.dst}")
        return 0

    if args.cmd == "import-vsp":
        import numpy as np

        from mmtraj.data.vsp import convert_vsp

        if (args.homography is None) == (args.scale is None):
            parser.error("pass exactly one of --homography or --scale")
        H = np.loadtxt(args.homography) if args.homography else None
        n = convert_vsp(args.src, args.dst, homography=H, scale=args.scale,
                        frame_step=args.frame_step)
        print(f"wrote {n} rows: {args.src} -> {args.dst}")
        return 0

    if args.cmd == "eval-loo":
        import os

        import numpy as np

        from mmtraj import checkpoint as ckpt_lib
        from mmtraj.evaluate import evaluate
        from mmtraj.models.forecaster import Forecaster

        name = "checkpoint_ema.npz" if args.ema else "checkpoint.npz"
        trees = args.loo_dir
        if len(trees) > 1 and not args.ensemble:
            parser.error("multiple --loo-dir trees require --ensemble "
                         "(they pool into one heterogeneous ensemble)")

        if args.ensemble and args.rollout != "sample":
            parser.error("--ensemble requires sampled rollouts")
        if args.buckets and len(trees) > 1:
            parser.error("--buckets is not supported on the heterogeneous "
                         "(multi-tree) ensemble path yet — evaluate_mixed "
                         "has no bucket router")

        def tree_seeds(tree):
            # train --scene all writes {out}/{scene} for one seed and
            # {out}/s{seed}/{scene} for --seeds runs; detect which.
            sdirs = sorted(
                int(d[1:]) for d in os.listdir(tree)
                if d.startswith("s") and d[1:].isdigit()
            )
            if args.seeds is not None:
                # An explicit --seeds list applies uniformly to EVERY tree
                # (per-tree seed selection isn't expressible — pool distinct
                # trees instead, as experiments/mixed_loo.py does).  Validate
                # the layout up front so a flat single-seed tree fails here
                # with its name, not mid-load with a missing-path error.
                missing = [s for s in args.seeds if s not in sdirs]
                if missing:
                    found = sdirs if sdirs else "a flat single-seed layout"
                    parser.error(
                        f"--seeds {args.seeds} applies to every --loo-dir "
                        f"tree, but {tree!r} has no s{{seed}}/ dirs for "
                        f"{missing} (found: {found})")
                return args.seeds
            return sdirs or [None]

        seeds_by_tree = {tree: tree_seeds(tree) for tree in trees}
        n_members = sum(len(s) for s in seeds_by_tree.values())
        if args.ensemble and n_members < 2:
            parser.error("--ensemble needs >=2 members (a multi-seed tree "
                         "or several --loo-dir trees)")
        per_scene = {}
        for scene in SCENES:
            ds = None  # members share a fold's data config; parse it once
            members = []  # --ensemble: pool (model, params) per member
            for tree in trees:
                for seed in seeds_by_tree[tree]:
                    sub = f"s{seed}/{scene}" if seed is not None else scene
                    path = os.path.join(tree, sub, name)
                    ck = ckpt_lib.load(path)
                    cfg = ck.config
                    if ds is None:
                        ds, _ = _load_eval_dataset(
                            cfg, False, "the metric population")
                    mcfg = (dataclasses.replace(cfg.model, dtype=args.dtype)
                            if args.dtype else cfg.model)
                    model = Forecaster(mcfg, cfg.data.obs_len,
                                       cfg.data.pred_len)
                    if args.ensemble:
                        members.append((model, ck.params))
                        continue
                    m = evaluate(model, ck.params, ck.stats, ds,
                                 cfg.train.k_samples, seed=args.seed,
                                 reduction=args.reduction, rollout=args.rollout,
                                 sigma_scale=args.sigma_scale,
                                 oversample=args.oversample, tta=args.tta,
                                 buckets=args.buckets)
                    per_scene.setdefault(scene, []).append(
                        (m["min_ade"], m["min_fde"])
                    )
                    tag = f"seed={seed} " if seed is not None else ""
                    print(f"{tag}scene={scene}: ADE={m['min_ade']:.4f} "
                          f"FDE={m['min_fde']:.4f}", flush=True)
            if args.ensemble:
                # Norm stats are a deterministic function of the fold's
                # training data, so every member's checkpoint carries the
                # same ones; the last ck's stats stand for the fold.
                if len(trees) == 1:
                    # Same-architecture members: the stacked-vmap path (one
                    # compiled program; bit-compatible with recorded tables).
                    m = evaluate(model, [p for _, p in members], ck.stats, ds,
                                 cfg.train.k_samples, seed=args.seed,
                                 reduction=args.reduction, rollout=args.rollout,
                                 sigma_scale=args.sigma_scale,
                                 oversample=args.oversample, tta=args.tta,
                                 buckets=args.buckets)
                else:
                    # Heterogeneous pool (e.g. rnn + attn trees): one program
                    # per distinct model, shared candidate pool + selection.
                    from mmtraj.evaluate import evaluate_mixed

                    m = evaluate_mixed(members, ck.stats, ds,
                                       cfg.train.k_samples, seed=args.seed,
                                       reduction=args.reduction,
                                       sigma_scale=args.sigma_scale,
                                       oversample=args.oversample,
                                       tta=args.tta)
                per_scene.setdefault(scene, []).append(
                    (m["min_ade"], m["min_fde"])
                )
                print(f"ensemble[{len(members)}] scene={scene}: "
                      f"ADE={m['min_ade']:.4f} FDE={m['min_fde']:.4f}",
                      flush=True)
        k = m["k"]
        extras = "".join(
            f" {key}={m[key]}"
            for key in ("oversample", "tta", "sigma_scale", "rollout",
                        "ensemble")
            if key in m
        )
        print(f"\nleave-one-out eval (best-of-{k}, {args.reduction}{extras}"
              f"{', EMA' if args.ema else ''}):")
        print(f"{'scene':8s} {'ADE(m)':>16s} {'FDE(m)':>16s}")
        avg_a, avg_f = [], []
        for scene, vals in per_scene.items():
            a = np.array([v[0] for v in vals])
            f = np.array([v[1] for v in vals])
            avg_a.append(a.mean())
            avg_f.append(f.mean())
            # Sample std (ddof=1) to match the train --seeds tables
            # (statistics.stdev); one convention for one experiment.  A
            # single row per scene (--ensemble) has no spread to report.
            if len(a) > 1:
                print(f"{scene:8s} {a.mean():8.4f}±{a.std(ddof=1):6.4f} "
                      f"{f.mean():8.4f}±{f.std(ddof=1):6.4f}")
            else:
                print(f"{scene:8s} {a.mean():8.4f}        "
                      f"{f.mean():8.4f}")
        print(f"{'AVG':8s} {np.mean(avg_a):8.4f}        "
              f"{np.mean(avg_f):8.4f}")
        return 0

    if args.cmd == "baseline":
        from mmtraj.baselines import evaluate_baseline
        from mmtraj.config import Config
        from mmtraj.data.collate import WindowDataset
        from mmtraj.data.registry import load_scene_windows

        cfg = _apply_overrides(Config(), args)
        scenes = SCENES if args.scene == "all" else (cfg.data.scene,)
        rows = []
        for scene in scenes:
            windows = load_scene_windows(
                cfg.data.data_dir, scene, cfg.data.obs_len, cfg.data.pred_len,
                cfg.data.stride, cfg.data.min_agents,
            )
            # Closed-form baselines have no device shapes to protect — pad to
            # the densest window so the metric population is always complete.
            n_max = max(cfg.data.n_max,
                        max((w.shape[0] for w in windows), default=1))
            m = evaluate_baseline(
                WindowDataset(windows, n_max), cfg.data.obs_len, args.baseline
            )
            rows.append(m)
            print(f"scene={scene} windows={m['n_windows']} "
                  f"agents={m['n_agents']}: {args.baseline.upper()} "
                  f"ADE={m['min_ade']:.4f}m FDE={m['min_fde']:.4f}m")
        if len(rows) > 1:
            print(f"average over {len(rows)} scenes: "
                  f"ADE={sum(m['min_ade'] for m in rows) / len(rows):.4f}m "
                  f"FDE={sum(m['min_fde'] for m in rows) / len(rows):.4f}m")
        return 0

    if args.cmd == "visualize":
        import jax
        import jax.numpy as jnp
        import numpy as np

        from mmtraj import checkpoint as ckpt_lib
        from mmtraj.data.collate import WindowDataset
        from mmtraj.data.registry import load_scene_windows
        from mmtraj.models.forecaster import Forecaster
        from mmtraj.utils.viz import render_predictions

        ck = ckpt_lib.load(args.ckpt)
        cfg = _apply_overrides(ck.config, args)
        windows = load_scene_windows(
            cfg.data.data_dir, cfg.data.scene, cfg.data.obs_len, cfg.data.pred_len,
            cfg.data.stride, cfg.data.min_agents,
        )
        rng = np.random.default_rng(args.seed)
        pick = rng.choice(len(windows), size=min(args.windows, len(windows)), replace=False)
        ds = WindowDataset([windows[i] for i in pick], cfg.data.n_max)
        model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
        xy, mask = jnp.asarray(ds.xy), jnp.asarray(ds.mask)
        rollouts = model.rollout_k(
            ck.params, xy[:, :, : cfg.data.obs_len], mask, ck.stats,
            jax.random.PRNGKey(args.seed), cfg.train.k_samples,
        )
        out = render_predictions(
            args.out, np.asarray(xy), np.asarray(mask), np.asarray(rollouts),
            cfg.data.obs_len, args.windows,
        )
        print(f"wrote {out} ({len(pick)} windows, K={cfg.train.k_samples}, "
              f"scene={cfg.data.scene})")
        return 0

    if args.cmd == "convert":
        from mmtraj import checkpoint as ckpt_lib

        if args.keras:
            from mmtraj.interop import load_keras_h5, save_keras_h5

            if args.src.endswith((".h5", ".hdf5")):
                # Keras -> mmtraj: weights live in the .h5; config+stats come
                # from the --like donor checkpoint (Keras save_weights stores
                # no config).
                if not args.like:
                    parser.error("--keras import needs --like <ckpt> for "
                                 "config + norm stats")
                donor = ckpt_lib.load(args.like)
                params = load_keras_h5(args.src, donor.config.model)
                ckpt_lib.save(args.dst, params, donor.stats, donor.config,
                              donor.step)
            else:
                # mmtraj -> Keras legacy save_weights layout.
                ck = ckpt_lib.load(args.src)
                save_keras_h5(args.dst, ck.params, ck.config.model)
            print(f"converted {args.src} -> {args.dst} (keras layout)")
            return 0
        ck = ckpt_lib.load(args.src)
        ckpt_lib.save(args.dst, ck.params, ck.stats, ck.config, ck.step)
        print(f"converted {args.src} -> {args.dst} (step={ck.step})")
        return 0

    if args.cmd == "autotune-eval":
        from mmtraj import checkpoint as ckpt_lib
        from mmtraj.evaluate import autotune_eval_batch
        from mmtraj.models.forecaster import Forecaster

        ck = ckpt_lib.load(args.ckpt)
        cfg = ck.config
        model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
        best = autotune_eval_batch(model, ck.params, ck.stats, cfg.data.n_max,
                                   args.k or cfg.train.k_samples,
                                   iters=args.iters, candidates=args.batches)
        print(f"use: eval --ckpt {args.ckpt} --batch-size {best}")
        return 0

    if args.cmd == "profile-stats":
        from mmtraj.utils.profiling import print_trace_summary

        print_trace_summary(args.trace_dir, args.top)
        return 0

    if args.cmd == "cache":
        from mmtraj.utils.compile_cache import (cache_stats, clear_cache,
                                                trim_cache)

        if args.clear:
            n, b = clear_cache()
            print(f"cleared {n} entries ({b / 1e6:.1f} MB)")
        elif args.trim_gb is not None:
            n, b = trim_cache(max_bytes=args.trim_gb * 1e9)
            print(f"trimmed {n} entries ({b / 1e6:.1f} MB)")
        s = cache_stats()
        print(f"cache dir: {s['dir']}\nentries: {s['entries']}\n"
              f"size: {s['total_bytes'] / 1e6:.1f} MB")
        return 0

    if args.cmd == "predict":
        import jax
        import jax.numpy as jnp
        import numpy as np

        from mmtraj import checkpoint as ckpt_lib
        from mmtraj.models.forecaster import Forecaster

        ck = ckpt_lib.load(args.ckpt)
        cfg = _apply_overrides(ck.config, args)
        ds, n_max = _load_eval_dataset(cfg, args.auto_n_max, "predictions")
        model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
        if args.oversample > 1 and cfg.model.head != "gmm":
            parser.error("--oversample requires the sampling (GMM) head")
        k, bs = cfg.train.k_samples, args.batch_size
        if bs is None:
            from mmtraj.evaluate import _model_bytes_per_elem, vmem_friendly_batch

            bs = vmem_friendly_batch(k * args.oversample, n_max,
                                     bytes_per_elem=_model_bytes_per_elem(model))

        # Per-window keys (fold_in of the global window index), same scheme
        # as evaluate(): the written rollouts are a pure function of
        # (seed, window), invariant to --batch-size.
        @jax.jit
        def roll(params, xy_obs, mask, win_idx, key):
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(win_idx)
            p = model.rollout_k(params, xy_obs, mask, ck.stats, None,
                                k * args.oversample, keys=keys)
            if args.oversample > 1:
                from mmtraj.models.sampling import diverse_select

                p = diverse_select(p, k)
            return p

        key = jax.random.PRNGKey(args.seed)
        preds, masks = [], []
        for s in range(0, len(ds), bs):
            idx = np.arange(s, min(s + bs, len(ds)))
            xy, mask = ds.batch(idx)
            if len(idx) < bs:
                pad = bs - len(idx)
                xy = np.concatenate([xy, np.zeros((pad,) + xy.shape[1:], xy.dtype)])
                mask = np.concatenate([mask, np.zeros((pad,) + mask.shape[1:], bool)])
            win_idx = jnp.arange(s, s + bs, dtype=jnp.int32)
            p = roll(ck.params, jnp.asarray(xy[:, :, : cfg.data.obs_len]),
                     jnp.asarray(mask), win_idx, key)
            preds.append(np.asarray(p)[:, : len(idx)])
            masks.append(mask[: len(idx)])
        preds_np = np.concatenate(preds, axis=1)  # (K, W, N, Tp, 2)
        masks_np = np.concatenate(masks, axis=0)  # (W, N)
        np.savez(args.out, predictions=preds_np, mask=masks_np,
                 obs_len=cfg.data.obs_len, pred_len=cfg.data.pred_len,
                 scene=cfg.data.scene, k=k,
                 **({"oversample": args.oversample} if args.oversample > 1 else {}))
        print(f"wrote {args.out}: predictions {preds_np.shape} "
              f"(K={k}, windows={masks_np.shape[0]}, scene={cfg.data.scene})")
        return 0

    if args.cmd == "serve":
        from mmtraj.serve import serve_lines

        served = serve_lines(args.artifact, sys.stdin, sys.stdout,
                             aggregate=args.aggregate, window_ms=args.window_ms,
                             stats_every=args.stats_every,
                             pipeline_encode=not args.no_pipeline_encode)
        print(f"served {served} request(s)", file=sys.stderr)
        return 0

    if args.cmd == "export":
        from mmtraj import checkpoint as ckpt_lib
        from mmtraj.export import export_predictor
        from mmtraj.models.forecaster import Forecaster

        ck = ckpt_lib.load(args.ckpt)
        cfg = ck.config
        model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
        if args.oversample > 1 and cfg.model.head != "gmm":
            # Mirrors the predict-path guard: a deterministic head rolls out
            # K*R identical trajectories; baking diverse_select over them into
            # the frozen StableHLO artifact would silently select duplicates.
            parser.error("--oversample requires the sampling (GMM) head")
        k = args.k or cfg.train.k_samples
        export_predictor(
            args.out, model, ck.params, ck.stats, k=k, batch=args.batch,
            n_agents=cfg.data.n_max, platform=args.platform,
            oversample=args.oversample,
        )
        os_tag = f", oversample={args.oversample}" if args.oversample > 1 else ""
        print(f"exported {args.ckpt} -> {args.out} "
              f"(K={k}, batch={args.batch}, N={cfg.data.n_max}{os_tag})")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
