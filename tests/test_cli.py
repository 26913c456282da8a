"""CLI entry-point tests (SURVEY.md §1 L5: public train/eval entry points).

Training runs are the cost center here (each `train` invocation pays a fresh
compile on the 1-CPU test host), so tests that only need *a* trained artifact
share the module-scoped ``loo_tree`` / ``ck3`` fixtures instead of training
their own — the properties under test (table formats, convert round-trips,
predict output contracts) are independent of which tiny run produced the
weights."""

import contextlib
import io

import pytest

from mmtraj.cli import main


pytestmark = pytest.mark.slow  # scan-heavy; quick subset: -m "not slow"


@pytest.fixture(scope="module")
def loo_tree(synth_dir, tmp_path_factory):
    """One 5-fold x 2-seed LOO training tree + its captured train stdout."""
    out = str(tmp_path_factory.mktemp("cli") / "loo")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(
            [
                "train", "--config", "3", "--data-dir", synth_dir, "--scene", "all",
                "--seeds", "0", "1", "--steps", "2", "--batch-size", "8", "--k", "2",
                "--n-max", "16", "--out-dir", out, "--eval-every", "0",
            ]
        )
    assert rc == 0
    return out, buf.getvalue()


@pytest.fixture(scope="module")
def ck3(synth_dir, tmp_path_factory):
    """One tiny trained config-3 (GMM head) checkpoint, shared read-only."""
    out = str(tmp_path_factory.mktemp("cli") / "ck3")
    with contextlib.redirect_stdout(io.StringIO()):
        assert main(
            [
                "train", "--config", "3", "--data-dir", synth_dir, "--scene", "zara2",
                "--steps", "5", "--batch-size", "8", "--k", "2", "--n-max", "16",
                "--out-dir", out, "--eval-every", "0",
            ]
        ) == 0
    return out + "/checkpoint.npz"


def test_generate_data(tmp_path):
    d = str(tmp_path / "gen")
    assert main(["generate-data", "--data-dir", d, "--n-frames", "60"]) == 0
    import glob

    assert len(glob.glob(d + "/*.txt")) == 5


def test_train_then_eval_cli(synth_dir, tmp_path, capsys):
    out = str(tmp_path / "cli_run")
    rc = main(
        [
            "train", "--config", "2", "--data-dir", synth_dir, "--scene", "zara2",
            "--steps", "20", "--batch-size", "8", "--k", "2", "--n-max", "24",
            "--out-dir", out, "--eval-every", "0",
        ]
    )
    assert rc == 0
    captured = capsys.readouterr().out
    assert "best-of-2" in captured and "ADE=" in captured

    rc = main(["eval", "--ckpt", out + "/checkpoint.npz", "--data-dir", synth_dir, "--k", "2"])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "best-of-2" in captured and "FDE=" in captured


def test_convert_cli_roundtrips_across_formats(synth_dir, ck3, tmp_path, capsys):
    """convert npz -> .pt -> .h5 -> eval gives identical metrics."""
    src = ck3
    pt, h5 = str(tmp_path / "ck.pt"), str(tmp_path / "ck.h5")
    assert main(["convert", "--src", src, "--dst", pt]) == 0
    assert main(["convert", "--src", pt, "--dst", h5]) == 0
    capsys.readouterr()
    results = []
    for ckpt in (src, pt, h5):
        assert main(["eval", "--ckpt", ckpt, "--data-dir", synth_dir, "--k", "2"]) == 0
        results.append(capsys.readouterr().out.split("ADE=")[1])
    assert results[0] == results[1] == results[2]

    # Keras legacy save_weights layout: out and back preserves eval exactly.
    kh5 = str(tmp_path / "keras_weights.h5")
    back = str(tmp_path / "from_keras.npz")
    assert main(["convert", "--keras", "--src", src, "--dst", kh5]) == 0
    assert main(["convert", "--keras", "--src", kh5, "--dst", back,
                 "--like", src]) == 0
    capsys.readouterr()
    assert main(["eval", "--ckpt", back, "--data-dir", synth_dir, "--k", "2"]) == 0
    assert capsys.readouterr().out.split("ADE=")[1] == results[0]


def test_train_all_scenes_leave_one_out(synth_dir, tmp_path, capsys):
    """--scene all runs the 5-fold protocol and prints the table + average."""
    rc = main(
        [
            "train", "--config", "2", "--data-dir", synth_dir, "--scene", "all",
            "--steps", "2", "--batch-size", "8", "--k", "1", "--n-max", "16",
            "--out-dir", str(tmp_path / "loo"), "--eval-every", "0",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    for scene in ("eth", "hotel", "univ", "zara1", "zara2", "AVG"):
        assert scene in out


def test_train_multiseed_reports_mean_std(synth_dir, tmp_path, capsys):
    """--seeds N M trains once per seed and prints mean±std of the finals."""
    rc = main(
        [
            "train", "--config", "2", "--data-dir", synth_dir, "--scene", "zara2",
            "--steps", "3", "--batch-size", "8", "--k", "1", "--n-max", "16",
            "--out-dir", str(tmp_path / "ms"), "--eval-every", "0",
            "--seeds", "0", "1",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "final (seed 0)" in out and "final (seed 1)" in out
    assert "over 2 seeds" in out and "±" in out
    # per-seed runs land in separate out dirs so checkpoints don't collide
    assert (tmp_path / "ms" / "s0" / "checkpoint.npz").exists()
    assert (tmp_path / "ms" / "s1" / "checkpoint.npz").exists()


def test_loo_multiseed_reports_mean_std(loo_tree):
    """--scene all --seeds runs the full protocol per seed; table is mean±std."""
    _, out = loo_tree
    assert "mean ± std over seeds" in out
    for scene in ("eth", "hotel", "univ", "zara1", "zara2", "AVG"):
        assert scene in out
    assert out.count("±") >= 12  # 6 rows x 2 cols


def test_predict_cli_writes_npz(synth_dir, ck3, tmp_path, capsys):
    npz = str(tmp_path / "p.npz")
    assert main([
        "predict", "--ckpt", ck3, "--data-dir", synth_dir,
        "--out", npz, "--k", "3", "--batch-size", "16",
    ]) == 0
    import numpy as onp

    z = onp.load(npz)
    preds, mask = z["predictions"], z["mask"]
    assert preds.shape[0] == 3 and preds.shape[1] == mask.shape[0]
    assert preds.shape[3:] == (12, 2)
    assert onp.isfinite(preds[:, mask]).all()


def test_eval_loo_cli(loo_tree, capsys):
    """eval-loo re-evaluates a train --scene all tree (auto-detected layout)
    and prints the per-scene mean±std table."""
    out, _ = loo_tree
    capsys.readouterr()
    assert main(["eval-loo", "--loo-dir", out, "--oversample", "2"]) == 0
    out_txt = capsys.readouterr().out
    assert "leave-one-out eval (best-of-2, per_agent oversample=2" in out_txt
    for scene in ("eth", "hotel", "univ", "zara1", "zara2", "AVG"):
        assert scene in out_txt
    assert out_txt.count("±") >= 10  # 5 scenes x 2 cols over 2 seeds


def test_eval_loo_ensemble_cli(loo_tree, capsys):
    """--ensemble pools the tree's per-seed checkpoints per fold (one deep-
    ensemble row per scene, tagged in the header, protocol still best-of-K)."""
    out, _ = loo_tree
    capsys.readouterr()
    assert main(["eval-loo", "--loo-dir", out, "--ensemble"]) == 0
    out_txt = capsys.readouterr().out
    assert "ensemble[2] scene=eth:" in out_txt
    assert "leave-one-out eval (best-of-2, per_agent ensemble=2" in out_txt
    for scene in ("eth", "hotel", "univ", "zara1", "zara2", "AVG"):
        assert scene in out_txt


def test_train_vmap_seeds_cli(synth_dir, tmp_path, capsys):
    """--vmap-seeds trains the seed sweep as one population program and
    writes the same s{seed}/ tree; guards reject unsupported compositions."""
    out = str(tmp_path / "pop")
    assert main([
        "train", "--config", "3", "--data-dir", synth_dir, "--scene", "zara2",
        "--seeds", "0", "1", "--vmap-seeds", "--steps", "4",
        "--batch-size", "8", "--k", "2", "--n-max", "16", "--out-dir", out,
    ]) == 0
    txt = capsys.readouterr().out
    assert "final (seed 0):" in txt and "final (seed 1):" in txt
    assert "over 2 seeds:" in txt
    import os

    from mmtraj import checkpoint as ckpt_lib

    for seed in (0, 1):
        ck = ckpt_lib.load(os.path.join(out, f"s{seed}", "checkpoint.npz"))
        assert ck.config.train.seed == seed
    # (--data-parallel now composes with --vmap-seeds: parity pinned by
    # tests/test_population.py::test_population_data_parallel.)
    for bad in (["--vmap-seeds"],  # no --seeds
                ["--seeds", "0", "1", "--vmap-seeds", "--stream"],
                ["--seeds", "0", "1", "--vmap-seeds", "--resume"],
                ["--seeds", "0", "1", "--vmap-seeds", "--tensorboard"]):
        with pytest.raises(SystemExit):
            main(["train", "--config", "3", "--data-dir", synth_dir,
                  "--scene", "zara2", "--steps", "2", "--out-dir", out] + bad)
        capsys.readouterr()


def test_train_loo_vmap_seeds_cli(synth_dir, tmp_path, capsys):
    """--scene all --vmap-seeds: each fold trains its seed population in one
    program; the mean±std table and the s{seed}/{scene} tree match the
    sequential driver's format."""
    import os

    out = str(tmp_path / "poploo")
    assert main([
        "train", "--config", "3", "--data-dir", synth_dir, "--scene", "all",
        "--seeds", "0", "1", "--vmap-seeds", "--steps", "2",
        "--batch-size", "8", "--k", "2", "--n-max", "16", "--out-dir", out,
        "--eval-every", "0",
    ]) == 0
    txt = capsys.readouterr().out
    assert "2 seeds [0, 1]): mean ± std over seeds" in txt
    assert "AVG" in txt
    for seed in (0, 1):
        for scene in ("eth", "zara2"):
            assert os.path.exists(
                os.path.join(out, f"s{seed}", scene, "checkpoint.npz"))


def test_eval_loo_mixed_trees_cli(loo_tree, capsys):
    """Several --loo-dir trees pool through evaluate_mixed (heterogeneous
    ensembles, e.g. different encoder families); without --ensemble they
    are rejected."""
    out, _ = loo_tree
    with pytest.raises(SystemExit):
        main(["eval-loo", "--loo-dir", out, out])  # needs --ensemble
    capsys.readouterr()
    assert main(["eval-loo", "--loo-dir", out, out, "--ensemble"]) == 0
    out_txt = capsys.readouterr().out
    assert "ensemble[4] scene=eth:" in out_txt  # 2 trees x 2 seeds
    assert "leave-one-out eval (best-of-2, per_agent ensemble=4" in out_txt


def test_predict_cli_oversample(synth_dir, ck3, tmp_path, capsys):
    npz = str(tmp_path / "p_os.npz")
    assert main([
        "predict", "--ckpt", ck3, "--data-dir", synth_dir,
        "--out", npz, "--k", "3", "--batch-size", "16", "--oversample", "2",
    ]) == 0
    import numpy as onp

    z = onp.load(npz)
    preds = z["predictions"]
    assert preds.shape[0] == 3  # K submitted, not R=6
    assert int(z["oversample"]) == 2
    assert onp.isfinite(preds[:, z["mask"]]).all()


def test_cli_requires_subcommand():
    with pytest.raises(SystemExit):
        main([])


def test_train_overrides_reach_config():
    """CLI flags land on the right frozen-dataclass fields (no training run)."""
    from mmtraj.cli import _apply_overrides, build_parser
    from mmtraj.config import get_config

    args = build_parser().parse_args(
        ["train", "--config", "3", "--warmup-steps", "2000", "--lr", "5e-4",
         "--encoder", "attn", "--attn-layers", "3"]
    )
    cfg = _apply_overrides(get_config("3"), args)
    assert cfg.train.warmup_steps == 2000
    assert cfg.train.lr == 5e-4
    assert cfg.model.encoder == "attn"
    assert cfg.model.attn_layers == 3


def test_train_ablation_overrides_reach_config():
    """The social-ablation knobs (--no-social / --num-heads /
    --adjacency-radius) land on ModelConfig; defaults stay untouched."""
    from mmtraj.cli import _apply_overrides, build_parser
    from mmtraj.config import get_config

    args = build_parser().parse_args(
        ["train", "--config", "3", "--no-social", "--num-heads", "2",
         "--adjacency-radius", "0"]
    )
    cfg = _apply_overrides(get_config("3"), args)
    assert cfg.model.social is False
    assert cfg.model.num_heads == 2
    assert cfg.model.adjacency_radius == 0.0
    # No flags -> the preset's values survive.
    args = build_parser().parse_args(["train", "--config", "3"])
    cfg = _apply_overrides(get_config("3"), args)
    assert cfg.model.social is True and cfg.model.num_heads == 1
    assert cfg.model.adjacency_radius == 4.0


def test_cli_rejects_unknown_scene():
    with pytest.raises(SystemExit):
        main(["train", "--scene", "nowhere"])


def test_import_vsp_cli(tmp_path, capsys):
    import numpy as np

    src = tmp_path / "crowds_zara.vsp"
    src.write_text(
        "1 - the number of splines\n"
        "2 - Num of control points\n"
        "0.0 0.0 0 0.0\n"
        "100.0 0.0 100 0.0\n"
    )
    H = tmp_path / "H.txt"
    np.savetxt(H, np.diag([0.02, 0.02, 1.0]))
    dst = tmp_path / "zara.txt"
    assert main(["import-vsp", "--src", str(src), "--dst", str(dst),
                 "--homography", str(H)]) == 0
    assert "wrote 11 rows" in capsys.readouterr().out
    rows = np.loadtxt(dst)
    assert rows.shape == (11, 4)

    with pytest.raises(SystemExit):
        main(["import-vsp", "--src", str(src), "--dst", str(dst)])


def test_predict_cli_batch_size_invariant(synth_dir, ck3, tmp_path):
    """predict output is a pure function of (seed, window): identical npz
    content at different --batch-size (per-window RNG, as in evaluate)."""
    import numpy as onp

    outs = []
    for bs in ("16", "7"):
        npz = str(tmp_path / f"pi_{bs}.npz")
        assert main([
            "predict", "--ckpt", ck3, "--data-dir", synth_dir,
            "--out", npz, "--k", "2", "--batch-size", bs,
        ]) == 0
        outs.append(onp.load(npz)["predictions"])
    onp.testing.assert_array_equal(outs[0], outs[1])


def test_autotune_eval_cli(ck3, capsys):
    capsys.readouterr()
    # --batches limits the sweep to two compiles (the default 8-point
    # bracket is the production path; the CLI contract is what's under test).
    assert main(["autotune-eval", "--ckpt", ck3,
                 "--iters", "2", "--batches", "2", "3"]) == 0
    txt = capsys.readouterr().out
    assert "best eval batch on this chip" in txt and "--batch-size" in txt
