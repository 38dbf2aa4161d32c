#!/usr/bin/env python3
"""Real-object calibration: a textured OBJ through the FULL pipeline.

No ShapeNet assets ship with the reference, so the "real object" is a
textured torus mesh (OBJ + MTL + PNG texture, non-trivial topology: a
handle, a hole, self-occlusion, thin crust) pushed through the exact
production chain — load_obj -> duplicate-face removal -> area-weighted
texture sampling -> voxel thinning (L0, ≙ mesh_sampling_geo_color_
shapenet.py) -> mode 0 viewspaces -> mode 3 coverage at every label view
count -> mode 4 NeRF sweep (2500 steps each, 100-view eval) -> lognormal
fit -> gradient/gap labels (≙ NeRF_fit_curve.cpp, main.cpp:2641-2645).

Checks recorded in experiments/artifacts/real_object_calibration.json:
the PSNR curve's lognormal fit converges, the fitted curve is monotone
with diminishing returns (lognormal CDF shape), and the dataset label
(gradient @ 0.02 dB/view) lands in the [13,58] clip window.

  nohup python -u experiments/exp_real_object.py > /tmp/exp_real.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def write_textured_torus(root: str, R: float = 0.35, r: float = 0.16,
                         nu: int = 64, nv: int = 32) -> str:
    """Torus OBJ with UVs, MTL, and a structured color texture."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    tex = np.zeros((256, 256, 3), np.uint8)
    # color bands around the tube + checker overlay: gives the sampled
    # cloud real texture-derived color variation to reconstruct
    yy, xx = np.mgrid[0:256, 0:256]
    tex[..., 0] = (127 + 120 * np.sin(2 * np.pi * xx / 256)).astype(np.uint8)
    tex[..., 1] = (127 + 120 * np.sin(4 * np.pi * yy / 256 + 1)).astype(np.uint8)
    tex[..., 2] = ((xx // 32 + yy // 32) % 2) * 180 + 40
    Image.fromarray(tex).save(os.path.join(root, "tex.png"))
    with open(os.path.join(root, "model.mtl"), "w") as f:
        f.write("newmtl torus\nKd 1 1 1\nmap_Kd tex.png\n")

    verts, uvs, faces = [], [], []
    for i in range(nu):
        for j in range(nv):
            u = 2 * np.pi * i / nu
            v = 2 * np.pi * j / nv
            x = (R + r * np.cos(v)) * np.cos(u)
            y = (R + r * np.cos(v)) * np.sin(u)
            z = r * np.sin(v)
            verts.append((x, y, z))
            uvs.append((i / nu, j / nv))
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces.append((a, b, c))
            faces.append((a, c, d))
    path = os.path.join(root, "model.obj")
    with open(path, "w") as f:
        f.write("mtllib model.mtl\n")
        for x, y, z in verts:
            f.write(f"v {x:.6f} {y:.6f} {z:.6f}\n")
        for u, v in uvs:
            f.write(f"vt {u:.6f} {v:.6f}\n")
        f.write("usemtl torus\n")
        for a, b, c in faces:
            f.write(f"f {a+1}/{a+1} {b+1}/{b+1} {c+1}/{c+1}\n")
    return path


def write_textured_knot(root: str, scale: float = 0.16, r: float = 0.07,
                        nu: int = 256, nv: int = 24) -> str:
    """Trefoil-knot tube OBJ with UVs, MTL and texture: a SECOND real
    textured mesh (VERDICT r4 next #9) with genuinely different geometry
    stress — non-trivial knot topology, strong self-occlusion between
    crossing strands, higher curvature variation than the torus."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    tex = np.zeros((256, 256, 3), np.uint8)
    yy, xx = np.mgrid[0:256, 0:256]
    tex[..., 0] = (127 + 120 * np.cos(6 * np.pi * xx / 256)).astype(np.uint8)
    tex[..., 1] = ((xx // 16 + yy // 16) % 2) * 160 + 60
    tex[..., 2] = (127 + 120 * np.sin(2 * np.pi * yy / 256 + 0.7)).astype(np.uint8)
    Image.fromarray(tex).save(os.path.join(root, "tex.png"))
    with open(os.path.join(root, "model.mtl"), "w") as f:
        f.write("newmtl knot\nKd 1 1 1\nmap_Kd tex.png\n")

    ref = np.array([0.13, 0.27, 0.95])
    ref /= np.linalg.norm(ref)
    verts, uvs, faces = [], [], []
    for i in range(nu):
        t = 2 * np.pi * i / nu
        c = scale * np.array([
            np.sin(t) + 2 * np.sin(2 * t),
            np.cos(t) - 2 * np.cos(2 * t),
            -np.sin(3 * t),
        ])
        tang = np.array([
            np.cos(t) + 4 * np.cos(2 * t),
            -np.sin(t) + 4 * np.sin(2 * t),
            -3 * np.cos(3 * t),
        ])
        tang /= np.linalg.norm(tang)
        n0 = np.cross(tang, ref)
        n0 /= np.linalg.norm(n0)
        b0 = np.cross(tang, n0)
        for j in range(nv):
            v = 2 * np.pi * j / nv
            pxyz = c + r * (np.cos(v) * n0 + np.sin(v) * b0)
            verts.append(tuple(pxyz))
            uvs.append((i / nu, j / nv))
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            cc = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces.append((a, b, cc))
            faces.append((a, cc, d))
    path = os.path.join(root, "model.obj")
    with open(path, "w") as f:
        f.write("mtllib model.mtl\n")
        for x, y, z in verts:
            f.write(f"v {x:.6f} {y:.6f} {z:.6f}\n")
        for u, v in uvs:
            f.write(f"vt {u:.6f} {v:.6f}\n")
        f.write("usemtl knot\n")
        for a, b, c in faces:
            f.write(f"f {a+1}/{a+1} {b+1}/{b+1} {c+1}/{c+1}\n")
    return path


def main():
    import argparse

    from nerf_prv_tpu.core.config import Config
    from nerf_prv_tpu.labeling.labels import fit_object_from_metrics
    from nerf_prv_tpu.pipeline import modes
    from nerf_prv_tpu.scene.mesh_sampling import sample_and_voxelize

    ap = argparse.ArgumentParser()
    ap.add_argument("--object", default="torus", choices=["torus", "knot"])
    args = ap.parse_args()
    kind = args.object
    name = f"{kind}0"
    root = "/tmp/real_obj_ws" if kind == "torus" else f"/tmp/real_obj_{kind}_ws"
    os.makedirs(root, exist_ok=True)
    gen = write_textured_torus if kind == "torus" else write_textured_knot
    obj = gen(os.path.join(root, "mesh"))
    ply = os.path.join(root, "models", "ShapeNet", f"{name}.ply")
    if not os.path.exists(ply):
        t0 = time.perf_counter()
        ok = sample_and_voxelize(obj, ply, n_points=300_000, grid_resolution=512,
                                 require_texture=True)
        assert ok
        print(f"L0 sample+voxelize {time.perf_counter()-t0:.1f}s", flush=True)

    # ≙ Fit_ShapeNet grid (NeRF_fit_curve.cpp:90).  PRV_REAL_STEP/PRV_REAL_MAX
    # coarsen the grid when a session deadline cannot afford the full 24-fit
    # sweep (the lognormal CDF is a 3-parameter fit; a handful of well-spread
    # counts determine it; per-count metrics are resume-guarded on disk, so a
    # killed sweep can be finished or refit later with a smaller MAX)
    step = int(os.environ.get("PRV_REAL_STEP", "2"))
    cmax = int(os.environ.get("PRV_REAL_MAX", "50"))
    counts = list(range(3, cmax + 1, step))
    # PRV_REAL_COUNTS pins the FIT list exactly (comma list) — the CPU
    # finisher path: with PRV_REAL_MAX=2 the mode-0/3/4 grid collapses to
    # the (already-trained) 100 anchor and the lognormal fit runs over
    # whatever per-count metrics a killed chip sweep left on disk
    env_counts = os.environ.get("PRV_REAL_COUNTS", "")
    if env_counts:
        counts = sorted({int(c) for c in env_counts.split(",")})
    cfg = Config(
        workspace=os.path.join(root, "ws"),
        model_path=os.path.join(root, "models"),
        viewspace_path=os.path.join(root, "ws", "viewspace"),
        name_of_pcd=name,
        coverage_view_num_max=cmax,
        coverage_view_num_add=step,
        n_steps=2500,
    )
    t0 = time.perf_counter()
    modes.mode_view_cover(cfg, sizes=counts + [100])
    print(f"mode0 viewspaces {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    modes.mode_get_coverage(cfg, [name])
    print(f"mode3 coverage {time.perf_counter()-t0:.1f}s", flush=True)

    # train the 100-view max-PSNR anchor FIRST: every downstream check needs
    # it, and the per-count sweep is resume-guarded — so a deadline kill
    # after this point always leaves a refittable state (re-run with a
    # smaller PRV_REAL_MAX to fit on whatever counts completed)
    t0 = time.perf_counter()
    modes.mode_instant_ngp(cfg.replace(coverage_view_num_max=2), [name])
    print(f"mode4 anchor (100 views) {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    modes.mode_instant_ngp(cfg, [name])
    print(f"mode4 sweep ({len(counts)} counts + 100) {time.perf_counter()-t0:.1f}s",
          flush=True)

    result = fit_object_from_metrics(
        cfg.gt_path, view_counts=counts,
        label_path=os.path.join(cfg.gt_path, "label.txt"),
    )
    curve = np.asarray(result.curve)
    psnrs = [
        float(open(os.path.join(cfg.gt_path, f"{v}.txt")).read().split()[1])
        for v in counts
    ]
    max_psnr = float(open(os.path.join(cfg.gt_path, "100.txt")).read().split()[1])
    grad_label = int(result.gradient_labels[1])  # ΔPSNR <= 0.02/view (main.cpp:2641)

    # lognormal-CDF shape checks: monotone rise, diminishing returns
    d = np.diff(curve)
    # tolerance: the fitted CDF is mathematically increasing but its f32
    # evaluation jitters ~1e-5 on the saturated tail
    monotone = bool((d > -1e-3).all())
    # tail gradient far below head gradient = saturating curve
    diminishing = bool(d[-10:].mean() < 0.25 * max(d[:10].mean(), 1e-9))
    artifact = {
        "converged": bool(result.converged),
        "view_counts": counts,
        "measured_psnr": [round(p, 3) for p in psnrs],
        "max_psnr_100": round(max_psnr, 3),
        "fitted_curve_3_100": [round(float(c), 3) for c in curve],
        "gradient_label_0.02": grad_label,
        "label_in_clip_window": 13 <= grad_label <= 58,
        "curve_monotone": monotone,
        "curve_diminishing_returns": diminishing,
    }
    suffix = "" if kind == "torus" else f"_{kind}"
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", f"real_object_calibration{suffix}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: v for k, v in artifact.items()
                      if k not in ("measured_psnr", "fitted_curve_3_100")}),
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
