#!/usr/bin/env python
"""Parity-day dress rehearsal, one motion (VERDICT r3 next-round #4).

Every hop a real ETH/UCY drop-in would take, chained in ONE process with an
assertion at each hop: raw-form fixtures (BIWI obsmat rows; UCY .vsp splines
+ pixel->meter homography) -> `cli import-obsmat` / `cli import-vsp` ->
canonical txt bit-compatible with the synthetic writer's -> train (config 3)
-> eval (finite best-of-K) -> checkpoint round-trips through BOTH candidate
reference conventions (torch .pt and legacy-Keras .h5) -> frozen StableHLO
export -> one served JSON-lines request.

The day real data or the reference appears, the drop-in claim is this
command, not a chain of READMEs:

    python tools/parity_rehearsal.py [--steps 400] [--workdir DIR]

Runs on whatever backend is live (real TPU or CPU).  The slow-suite test
tests/test_parity_rehearsal.py runs the same `rehearse()` on the CPU mesh.
Raw fixtures are derived from the synthetic canonical scenes, so the
import hop is checked by round-trip equality, not just by "it parsed".
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import shutil
import sys
import tempfile

import numpy as np

SCENES = ("eth", "hotel", "univ", "zara1", "zara2")


def _load_canonical(path):
    return np.loadtxt(path, dtype=np.float64).reshape(-1, 4)


def _write_obsmat_raw(canonical_txt, dst):
    """Canonical (frame id x y) -> 8-col BIWI obsmat rows
    [frame id pos_x pos_z pos_y v_x v_z v_y] (z = the height axis)."""
    rows = _load_canonical(canonical_txt)
    n = len(rows)
    raw = np.column_stack([
        rows[:, 0], rows[:, 1], rows[:, 2], np.zeros(n), rows[:, 3],
        np.zeros((n, 3)),
    ])
    np.savetxt(dst, raw)


def _write_vsp_raw(canonical_txt, vsp_dst, h_dst):
    """Canonical rows -> UCY .vsp splines in PIXEL coordinates + the 3x3
    pixel->meter homography that recovers the meters.  Every annotation
    point becomes a control point on the frame grid, so linear spline
    interpolation reproduces the rows exactly."""
    rows = _load_canonical(canonical_txt)
    # meters = H @ [px, py, 1]: a representative UCY-style calibration
    # (anisotropic scale + translation; affine so the fixture is exact).
    H = np.array([[0.047, 0.0, -3.2], [0.0, -0.051, 14.9], [0.0, 0.0, 1.0]])
    Hinv = np.linalg.inv(H)
    ones = np.ones((len(rows), 1))
    px = (Hinv @ np.column_stack([rows[:, 2:4], ones]).T).T
    px = px[:, :2] / px[:, 2:3]
    lines = []
    ped_ids = np.unique(rows[:, 1])
    lines.append(f"{len(ped_ids)} - the number of splines")
    for pid in ped_ids:
        sel = rows[:, 1] == pid
        pts = np.column_stack([px[sel], rows[sel, 0]])
        pts = pts[np.argsort(pts[:, 2])]
        lines.append(f"{len(pts)} - Num of control points")
        for x, y, f in pts:
            lines.append(f"{x:.9f} {y:.9f} {int(f)} 0.0")
    with open(vsp_dst, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    np.savetxt(h_dst, H)


def _assert_same_annotations(imported_txt, canonical_txt, what, atol=1e-4):
    """Same (frame, x, y) rows, with ped ids equal up to a bijective
    relabeling (the vsp importer renumbers ids from its spline order)."""
    a = _load_canonical(imported_txt)
    b = _load_canonical(canonical_txt)
    order = lambda r: np.lexsort((r[:, 3], r[:, 2], r[:, 0]))  # noqa: E731
    a, b = a[order(a)], b[order(b)]
    assert a.shape == b.shape, (
        f"{what}: imported {a.shape} rows vs canonical {b.shape}")
    np.testing.assert_allclose(a[:, [0, 2, 3]], b[:, [0, 2, 3]], atol=atol,
                               rtol=0, err_msg=f"{what}: frame/x/y differ")
    fwd, bwd = {}, {}
    for ia, ib in zip(a[:, 1], b[:, 1]):
        assert fwd.setdefault(ia, ib) == ib and bwd.setdefault(ib, ia) == ia, (
            f"{what}: ped ids are not a bijection ({ia} vs {ib})")


def _cli(*argv) -> str:
    """Run a cli subcommand in-process, assert rc==0, return its stdout."""
    from mmtraj.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(list(argv))
    out = buf.getvalue()
    assert rc == 0, f"cli {argv[0]} failed (rc={rc}):\n{out}"
    return out


def _params_allclose(a, b, what, rtol=1e-6, atol=1e-6):
    import jax

    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb), f"{what}: tree structure changed"
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol, err_msg=what)


def rehearse(workdir: str, steps: int = 400, k: int = 20,
             n_frames: int = 200, verbose: bool = True) -> dict:
    """The full drop-in chain; raises AssertionError at the failing hop.
    Returns {hop: evidence} for reporting."""
    from mmtraj import checkpoint as ckpt_lib
    from mmtraj.serve import serve_lines

    log = print if verbose else (lambda *a, **kw: None)
    evidence = {}
    canon = os.path.join(workdir, "canonical")
    rawd = os.path.join(workdir, "raw")
    data = os.path.join(workdir, "data")
    for d in (canon, rawd, data):
        os.makedirs(d, exist_ok=True)

    # Hop 1: canonical fixtures + raw forms derived from them.
    _cli("generate-data", "--data-dir", canon, "--n-frames", str(n_frames))
    _write_obsmat_raw(os.path.join(canon, "eth.txt"),
                      os.path.join(rawd, "obsmat.txt"))
    _write_vsp_raw(os.path.join(canon, "zara1.txt"),
                   os.path.join(rawd, "crowds_zara01.vsp"),
                   os.path.join(rawd, "H.txt"))
    log("[1/7] raw fixtures written (obsmat 8-col; .vsp splines + H)")

    # Hop 2: the import surfaces produce canonical txt, checked by
    # round-trip equality against the originals.
    _cli("import-obsmat", "--src", os.path.join(rawd, "obsmat.txt"),
         "--dst", os.path.join(data, "eth.txt"))
    _cli("import-vsp", "--src", os.path.join(rawd, "crowds_zara01.vsp"),
         "--dst", os.path.join(data, "zara1.txt"),
         "--homography", os.path.join(rawd, "H.txt"))
    _assert_same_annotations(os.path.join(data, "eth.txt"),
                             os.path.join(canon, "eth.txt"), "import-obsmat")
    _assert_same_annotations(os.path.join(data, "zara1.txt"),
                             os.path.join(canon, "zara1.txt"), "import-vsp")
    for s in ("hotel", "univ", "zara2"):
        shutil.copy(os.path.join(canon, f"{s}.txt"),
                    os.path.join(data, f"{s}.txt"))
    evidence["import"] = "obsmat+vsp round-trip exact"
    log("[2/7] import-obsmat + import-vsp round-trip canonical rows exactly")

    # Hop 3: train on the imported tree.
    out = os.path.join(workdir, "run")
    _cli("train", "--config", "3", "--scene", "zara1", "--data-dir", data,
         "--steps", str(steps), "--k", str(k), "--out-dir", out,
         "--eval-every", "0")
    ckpt = os.path.join(out, "checkpoint.npz")
    assert os.path.exists(ckpt), "train wrote no checkpoint"
    log(f"[3/7] trained {steps} steps on the imported tree")

    # Hop 4: eval — finite best-of-K on the held-out (imported) scene.
    txt = _cli("eval", "--ckpt", ckpt, "--data-dir", data, "--k", str(k))
    line = [ln for ln in txt.splitlines() if "ADE=" in ln][-1]
    ade = float(line.split("ADE=")[1].split("m")[0])
    fde = float(line.split("FDE=")[1].split("m")[0])
    assert np.isfinite(ade) and np.isfinite(fde), line
    evidence["eval"] = f"ADE={ade:.4f} FDE={fde:.4f}"
    log(f"[4/7] eval finite: ADE={ade:.4f} FDE={fde:.4f}")

    # Hop 5: checkpoint round-trips through BOTH candidate reference
    # conventions (torch .pt; legacy-Keras save_weights .h5).
    orig = ckpt_lib.load(ckpt)
    pt = os.path.join(workdir, "ck.pt")
    back_pt = os.path.join(workdir, "ck_from_pt.npz")
    _cli("convert", "--src", ckpt, "--dst", pt)
    _cli("convert", "--src", pt, "--dst", back_pt)
    _params_allclose(orig.params, ckpt_lib.load(back_pt).params,
                     "torch .pt round trip")
    h5 = os.path.join(workdir, "ck_keras.h5")
    back_h5 = os.path.join(workdir, "ck_from_keras.npz")
    _cli("convert", "--src", ckpt, "--dst", h5, "--keras")
    _cli("convert", "--src", h5, "--dst", back_h5, "--keras", "--like", ckpt)
    # Keras-convention params legitimately gain a zero recurrent-bias leaf
    # (``bh``, the reset_after dual-bias slot mmtraj's fused cell folds into
    # ``b``): every original leaf must round-trip exactly, every extra leaf
    # must be the functional no-op zeros (forward-equivalence is pinned by
    # tests/test_import_shim.py against real keras cells).
    back = ckpt_lib.load(back_h5).params
    import jax.tree_util as tu

    orig_leaves = dict(tu.tree_flatten_with_path(orig.params)[0])
    for path_k, leaf in tu.tree_flatten_with_path(back)[0]:
        if path_k in orig_leaves:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(orig_leaves[path_k]),
                rtol=1e-6, atol=1e-6,
                err_msg=f"keras round trip: {tu.keystr(path_k)}")
        else:
            assert not np.asarray(leaf).any(), (
                f"keras round trip grew a NONZERO leaf {tu.keystr(path_k)}")
    evidence["convert"] = "pt + keras-h5 round trips allclose"
    log("[5/7] checkpoint round-trips: torch .pt and legacy-Keras .h5")

    # Hop 6: frozen StableHLO export.
    art = os.path.join(workdir, "predictor.stablehlo")
    _cli("export", "--ckpt", ckpt, "--out", art, "--batch", "4",
         "--k", str(k))
    assert os.path.getsize(art) > 0
    log("[6/7] exported frozen predictor")

    # Hop 7: serve one request through the JSON-lines protocol
    # (mmtraj/serve.py: {"xy": [N][T_obs][2], "seed": ...} ->
    #  {"pred": [K][N][T_pred][2], "k": K} for a singleton batch).
    rng = np.random.default_rng(0)
    obs = np.cumsum(rng.normal(size=(3, 8, 2)) * 0.3, axis=1)
    req = {"xy": obs.tolist(), "seed": 7}
    stdout = io.StringIO()
    served = serve_lines(art, io.StringIO(json.dumps(req) + "\n"), stdout)
    assert served == 1, f"serve answered {served} ok (expected 1)"
    resp = json.loads(stdout.getvalue().splitlines()[-1])
    assert "pred" in resp and resp.get("k") == k, resp.keys()
    pred = np.asarray(resp["pred"])
    assert pred.shape == (k, 3, 12, 2), pred.shape
    assert np.isfinite(pred).all()
    evidence["serve"] = f"1 request -> pred{pred.shape}"
    log(f"[7/7] served one request: pred {pred.shape}")
    log("parity rehearsal: ALL HOPS GREEN")
    return evidence


def main(argv=None) -> int:
    from mmtraj.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--workdir", default=None,
                    help="default: a fresh temp dir (kept on failure)")
    args = ap.parse_args(argv)
    workdir = args.workdir or tempfile.mkdtemp(prefix="parity_rehearsal_")
    print(f"workdir: {workdir}")
    rehearse(workdir, steps=args.steps, k=args.k)
    return 0


if __name__ == "__main__":
    sys.exit(main())
