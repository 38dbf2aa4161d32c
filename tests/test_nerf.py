import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerf_prv_tpu.nerf import (
    HashGridConfig,
    NerfConfig,
    encode,
    eval_nerf,
    init_params,
    init_table,
    load_dataset,
    mse2psnr,
    psnr,
    ray_aabb,
    render_rays,
    ssim,
    train_nerf,
)
from nerf_prv_tpu.nerf.model import sh_encode_deg4

from synthetic import write_scene

TINY = NerfConfig(
    grid=HashGridConfig(levels=8, features=2, log2_table=14, n_min=16, n_max=256),
    hidden=64,
    n_samples=48,
    train_rays=1024,
    n_steps=300,
)


def test_hash_encode_shapes_and_grad():
    cfg = HashGridConfig(levels=4, features=2, log2_table=10, n_min=4, n_max=32)
    table = init_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    f = encode(table, x, cfg)
    assert f.shape == (32, cfg.out_dim)

    def loss(t):
        return jnp.sum(encode(t, x, cfg) ** 2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert float(jnp.abs(g).sum()) > 0


def test_hash_encode_is_continuous():
    cfg = HashGridConfig(levels=4, features=2, log2_table=10, n_min=4, n_max=32)
    table = init_table(jax.random.PRNGKey(0), cfg, scale=1.0)
    x = jnp.array([[0.33, 0.5, 0.77]])
    eps = 1e-5
    f0 = encode(table, x, cfg)
    f1 = encode(table, x + eps, cfg)
    assert float(jnp.abs(f1 - f0).max()) < 1e-2


def test_sh_encoding_dc_and_count():
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    sh = sh_encode_deg4(d)
    assert sh.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(sh[:, 0]), 0.2820947917, atol=1e-6)


def test_ray_aabb():
    o = jnp.array([[0.5, 0.5, -1.0], [0.5, 0.5, 0.5], [2.0, 2.0, 2.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    tmin, tmax, valid = ray_aabb(o, d)
    assert valid[0] and valid[1] and not valid[2]
    assert float(tmin[0]) == pytest.approx(1.0)
    assert float(tmax[0]) == pytest.approx(2.0)
    assert float(tmin[1]) == pytest.approx(0.0)
    assert float(tmax[1]) == pytest.approx(0.5)


def test_render_rays_ranges():
    params = init_params(jax.random.PRNGKey(0), TINY)
    o = jnp.array([[0.5, 0.5, -0.5]] * 8)
    d = jnp.array([[0.0, 0.0, 1.0]] * 8)
    rgb, alpha = render_rays(params, o, d, TINY)
    assert rgb.shape == (8, 3) and alpha.shape == (8,)
    assert float(rgb.min()) >= 0.0
    assert float(alpha.min()) >= 0.0 and float(alpha.max()) <= 1.0 + 1e-5


def test_load_dataset_extensionless_file_path(tmp_path):
    """instant-ngp accepts extensionless transforms.json file_path entries
    (the NeRF-synthetic "train/r_0" convention) by appending ".png"; the
    loader must accept both spellings."""
    import json

    train_json, _, _, _ = write_scene(str(tmp_path), n_train=2, n_test=1)
    with open(train_json) as f:
        root = json.load(f)
    assert all(fr["file_path"].endswith(".png") for fr in root["frames"])
    for fr in root["frames"]:
        fr["file_path"] = fr["file_path"][: -len(".png")]
    bare_json = str(tmp_path / "train_bare.json")
    with open(bare_json, "w") as f:
        json.dump(root, f)
    a = load_dataset(train_json)
    b = load_dataset(bare_json)
    np.testing.assert_array_equal(a.pixels, b.pixels)


def test_psnr_ssim_basics():
    img = jnp.zeros((32, 32, 3)) + 0.5
    assert float(psnr(img, img)) > 100
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    noisy = img + 0.1
    # known MSE 0.01 -> PSNR 20
    assert float(psnr(noisy, img)) == pytest.approx(20.0, abs=1e-4)
    assert float(mse2psnr(0.01)) == pytest.approx(20.0, abs=1e-6)


@pytest.mark.slow
def test_nerf_end_to_end_synthetic(tmp_path):
    train_json, test_json, _, _ = write_scene(str(tmp_path), n_train=12, n_test=4)
    params, ds = train_nerf(train_json, TINY, seed=0)
    assert ds.n_frames == 12
    metrics = eval_nerf(params, test_json, TINY)
    # black-frame baseline for reference
    test_ds = load_dataset(test_json)
    gt = test_ds.pixels[..., :3] * test_ds.pixels[..., 3:4]
    black_psnr = float(mse2psnr(np.mean(gt**2)))
    assert metrics["PSNR"] > black_psnr + 4.0, (metrics, black_psnr)
    assert metrics["PSNR"] > 17.0, metrics
    assert 0.5 < metrics["SSIM"] <= 1.0


def test_snapshot_roundtrip_no_train(tmp_path):
    """Fast snapshot coverage: bit-exact save/load + cfg shape validation
    (ADVICE r1) without the trained-render compile cost of the full
    roundtrip below."""
    from nerf_prv_tpu.nerf.api import load_snapshot, save_snapshot

    params = init_params(jax.random.PRNGKey(3), TINY)
    snap = str(tmp_path / "snap.ingp")
    save_snapshot(snap, params)
    loaded = load_snapshot(snap, TINY)  # matching cfg validates and passes
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]), np.asarray(loaded[k]))
    bad = dataclasses.replace(TINY, voxel_grid_size=TINY.voxel_grid_size + 2)
    with pytest.raises(ValueError):
        load_snapshot(snap, bad)


@pytest.mark.slow  # trains + evals twice: ~44 s of CPU scan compiles
def test_snapshot_roundtrip(tmp_path):
    """save_snapshot/load_snapshot preserve params bit-exactly and render
    identically (≙ run.py --save_snapshot/--load_snapshot, run.py:36-37)."""
    from nerf_prv_tpu.nerf.api import load_snapshot, save_snapshot

    train_json, test_json, _, _ = write_scene(
        str(tmp_path), n_train=4, n_test=2, n_points=3000
    )
    cfg = dataclasses.replace(TINY, n_steps=20)
    params, _ = train_nerf(train_json, cfg, seed=0)
    snap = str(tmp_path / "snap.ingp")  # extension-less of .npz: must round-trip
    save_snapshot(snap, params)
    loaded = load_snapshot(snap)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]), np.asarray(loaded[k]))
    m1 = eval_nerf(params, test_json, cfg)
    m2 = eval_nerf(loaded, test_json, cfg)
    assert m1["PSNR"] == pytest.approx(m2["PSNR"], abs=1e-5)
    # cfg-aware load validates shapes: a mismatched grid config fails fast
    # instead of as a shape error deep inside render (ADVICE r1)
    load_snapshot(snap, cfg)  # matching cfg passes
    bad = dataclasses.replace(cfg, voxel_grid_size=cfg.voxel_grid_size + 2)
    with pytest.raises(ValueError, match="grid shape"):
        load_snapshot(snap, bad)
    with pytest.raises(ValueError, match="hash-field"):
        load_snapshot(snap, dataclasses.replace(cfg, field_impl="hash"))


@pytest.mark.slow  # ~36 s: two full render-grad compiles.  The bf16 gather
# VIEW itself is the default (voxel_gather_dtype="bf16") and is exercised by
# every fast render/train test; only this f32-closeness numerics bound is slow.
def test_bf16_gather_grad_close_to_f32(tmp_path):
    """Gradients through the bf16 gather view stay close to the full-f32
    path: per-contribution cotangents are bf16-rounded before the f32
    scatter accumulation, so the error is bounded by bf16's ~3 decimal
    digits, not by accumulation order (ADVICE r1, voxelfield.py)."""
    cfg16 = dataclasses.replace(TINY, voxel_gather_dtype="bf16")
    cfg32 = dataclasses.replace(TINY, voxel_gather_dtype="f32")
    params = init_params(jax.random.PRNGKey(0), cfg32)
    # give the grid non-trivial values so gradients have real magnitude
    params["grid"] = jax.random.normal(jax.random.PRNGKey(1), params["grid"].shape) * 0.1
    n = 256
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    o = jnp.concatenate(
        [jax.random.uniform(k1, (n, 2)), jnp.full((n, 1), -0.5)], axis=-1
    )
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    tgt = jax.random.uniform(k2, (n, 3))

    def loss(p, cfg):
        rgb, _ = render_rays(p, o, d, cfg, key=jax.random.PRNGKey(3))
        return jnp.mean((rgb - tgt) ** 2)

    g16 = jax.grad(lambda p: loss(p, cfg16))(params)
    g32 = jax.grad(lambda p: loss(p, cfg32))(params)
    for k in g32:
        a, b = np.asarray(g16[k], np.float64), np.asarray(g32[k], np.float64)
        denom = np.abs(b).max() + 1e-12
        # bf16 rounds each contribution to ~3 decimal digits; per-entry
        # error relative to the tree's max-magnitude gradient stays <10%
        assert np.abs(a - b).max() / denom < 0.10, (k, np.abs(a - b).max(), denom)


@pytest.mark.slow
def test_aux_probe_matches_mlp_probe(tmp_path):
    """The two-level RenderAux probe must reproduce the direct-MLP probe's
    renders on a trained field (tables are conservative approximations;
    PSNR between the two renders should be high)."""
    from nerf_prv_tpu.nerf.render import build_render_aux, render_views

    train_json, test_json, _, _ = write_scene(
        str(tmp_path), n_train=6, n_test=2, n_points=5000
    )
    cfg = dataclasses.replace(TINY, n_steps=150)
    params, ds = train_nerf(train_json, cfg, seed=0)
    test_ds = load_dataset(test_json, with_images=False)
    org = jnp.asarray(test_ds.origins)
    rot = jnp.asarray(test_ds.rotations)
    with_aux = np.asarray(render_views(params, org, rot, test_ds.camera, cfg))
    # force the aux-less (direct MLP probe) path through render_rays
    from nerf_prv_tpu.nerf.render import render_rays
    from nerf_prv_tpu.nerf.rays import pixel_dirs_cam

    cam = test_ds.camera
    u, v = jnp.meshgrid(
        jnp.arange(cam.width, dtype=jnp.float32),
        jnp.arange(cam.height, dtype=jnp.float32),
    )
    d_cam = pixel_dirs_cam(cam, u.reshape(-1), v.reshape(-1))
    d = jnp.einsum("ij,nj->ni", rot[0], d_cam)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(org[0][None], d.shape)
    rgb, a = render_rays(params, o, d, cfg, aux=None)
    no_aux = np.asarray(
        jnp.concatenate([rgb, a[:, None]], -1).reshape(cam.height, cam.width, 4)
    )
    mse = float(np.mean((with_aux[0] - no_aux) ** 2))
    assert mse < 1e-3, mse  # > 30 dB agreement between the probe paths


@pytest.mark.slow  # ~20 s.  NOTE: this is the ONLY tile-vs-per-ray identity
# check; the fast lane keeps just the spec/deferred self-consistency tests
# (tile-vs-tile), so run --slow after touching the tile-compaction math.
def test_render_views_tile_path_wide_frame():
    """w >= 512 takes the tile-compaction branch; output must match the
    per-ray render of the same rays."""
    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.nerf.render import build_render_aux, render_rays, render_views
    from nerf_prv_tpu.nerf.rays import pixel_dirs_cam

    cfg = TINY
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = {k: (v + 0.3 if k == "grid" else v) for k, v in params.items()}
    cam = CameraConfig(width=640, height=12, fx=100.0, fy=100.0, ppx=320.0, ppy=6.0, model=0)
    rng = np.random.default_rng(2)
    vv = rng.normal(size=(2, 3))
    vv[:, 2] = np.abs(vv[:, 2])
    vv /= np.linalg.norm(vv, axis=1, keepdims=True)
    c2w = camera_to_world(vv * 0.3, np.zeros(3) + 1e-4)
    rot = jnp.asarray(c2w[:, :3, :3][:, [2, 0, 1], :], jnp.float32)
    org = jnp.asarray(c2w[:, :3, 3][:, [2, 0, 1]] * 5.0 + 0.5, jnp.float32)
    img = render_views(params, org, rot, cam, cfg, chunk=1024)
    assert img.shape == (2, 12, 640, 4)

    aux = build_render_aux(params, cfg)
    u, v = jnp.meshgrid(
        jnp.arange(640, dtype=jnp.float32), jnp.arange(12, dtype=jnp.float32)
    )
    d_cam = pixel_dirs_cam(cam, u.reshape(-1), v.reshape(-1))
    d = jnp.einsum("ij,nj->ni", rot[1], d_cam)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(org[1][None], d.shape)
    rgb, a = render_rays(params, o, d, cfg, aux=aux)
    ref = np.asarray(jnp.concatenate([rgb, a[:, None]], -1).reshape(12, 640, 4))
    np.testing.assert_allclose(np.asarray(img[1]), ref, atol=2e-3)


def test_two_phase_partition_rays():
    """_jit_partition_packed puts occupied rays first (order preserved),
    appends one dead pad chunk, and pos inverts the permutation."""
    from nerf_prv_tpu.nerf.render import _jit_partition_packed

    rng = np.random.default_rng(0)
    rays_np = rng.normal(size=(12, 6)).astype(np.float32)
    occ_np = np.asarray([1, 0, 1, 1, 0, 0, 1, 0, 0, 1, 0, 1], np.float32)
    tlo_np = np.arange(12, dtype=np.float32) * 0.1
    thi_np = tlo_np + 1.0
    packed = jnp.asarray(
        np.concatenate(
            [rays_np, tlo_np[:, None], thi_np[:, None], occ_np[:, None]], axis=-1
        )
    )
    out, pos, n_occ = _jit_partition_packed(packed, pad=4)
    n_occ = int(n_occ)
    assert n_occ == 6
    assert out.shape == (12 + 4, 9)
    # first n_occ rows are the occupied rays in original order
    occ_idx = np.nonzero(occ_np > 0.5)[0]
    np.testing.assert_allclose(np.asarray(out[:6, :6]), rays_np[occ_idx], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:6, 6]), tlo_np[occ_idx])
    assert bool((np.asarray(out[:6, 8]) > 0.5).all())
    assert not (np.asarray(out[6:, 8]) > 0.5).any()
    # dead pad rows carry t_hi = 1 (non-degenerate span)
    np.testing.assert_allclose(np.asarray(out[12:, 7]), 1.0)
    # pos maps each original ray to its partitioned slot
    for i in range(12):
        np.testing.assert_allclose(
            np.asarray(out[int(pos[i]), :6]), rays_np[i], rtol=1e-6
        )


def test_span_bucket_partition_and_render():
    """_jit_partition_short moves short-span occupied rays first (stable,
    occupied rays stay ahead of non-occupied), and the span-bucketed
    render path stays close to the uniform march."""
    from nerf_prv_tpu.nerf.render import _jit_partition_short

    # input is occupied-first (the function's precondition — it consumes
    # _jit_partition_packed output); spans 0.1..0.8, smax=0.8, thresh 0.4
    tlo_np = np.zeros(8, np.float32)
    thi_np = np.asarray([0.1, 0.8, 0.3, 0.6, 0.7, 0.4, 0.5, 0.2], np.float32)
    occ_np = np.asarray([1, 1, 1, 1, 1, 1, 1, 0], np.float32)
    rays_np = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
    packed = jnp.asarray(
        np.concatenate(
            [rays_np, tlo_np[:, None], thi_np[:, None], occ_np[:, None]], axis=-1
        )
    )
    out, pos, n_short = _jit_partition_short(packed, 12, 24)
    n_short = int(n_short)
    # short = occupied & span <= 0.4: rows 0 (0.1), 2 (0.3), 5 (0.4)
    assert n_short == 3
    got_short = np.asarray(out[:3, 7])
    np.testing.assert_allclose(got_short, [0.1, 0.3, 0.4])
    # every occupied ray is ahead of the single non-occupied one
    occ_sorted = np.asarray(out[:, 8]) > 0.5
    assert occ_sorted[:7].all() and not occ_sorted[7]
    # pos inverts the permutation
    for i in range(8):
        np.testing.assert_allclose(
            np.asarray(out[int(pos[i]), :6]), rays_np[i], rtol=1e-6
        )


def test_speculative_render_exact_spec_fallback():
    """The sync-free tile render: the speculative steady state must be
    bit-identical to the exact first call, counts must reach the stable
    (slack-free) state on repeats, and an under-speculated call (field
    got denser under the same cache key) must fall back and still match
    a fresh exact render."""
    import dataclasses

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf.render import _SPEC_COUNTS, build_render_aux, render_views

    # 512 wide forces the tile branch; 24 rows (3 chunks of 4096) keeps
    # the repeated renders fast while still spanning multiple chunks
    cam = CameraConfig(width=512, height=24, fx=400.0, fy=400.0,
                       ppx=256.0, ppy=12.0)
    cfg = NerfConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    params["grid"] = params["grid"] + 0.5
    aux = build_render_aux(params, cfg)
    rot = jnp.eye(3)[None]
    org = jnp.asarray([[0.5, 0.5, -0.6]])
    _SPEC_COUNTS.clear()
    a1 = render_views(params, org, rot, cam, cfg, chunk=4096, aux=aux)
    key = next(iter(_SPEC_COUNTS))
    assert not _SPEC_COUNTS[key][4]  # first call: not yet stable
    a2 = render_views(params, org, rot, cam, cfg, chunk=4096, aux=aux)
    assert _SPEC_COUNTS[key][4]  # counts repeated -> stable, slack-free
    a3 = render_views(params, org, rot, cam, cfg, chunk=4096, aux=aux)
    assert bool(jnp.all(a1 == a2)) and bool(jnp.all(a1 == a3))

    # denser field under the SAME cache key: survivor counts grow past the
    # remembered bounds -> the verification readback must catch it and
    # fall back to the exact path
    params2 = dict(params)
    params2["grid"] = params["grid"] + 3.0
    aux2 = build_render_aux(params2, cfg)
    b1 = render_views(params2, org, rot, cam, cfg, chunk=4096, aux=aux2)
    _SPEC_COUNTS.clear()
    b2 = render_views(params2, org, rot, cam, cfg, chunk=4096, aux=aux2)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_deferred_render_pipeline():
    """render_views(defer=True): the pipelined eval path (api.eval_nerf)
    must (a) match the blocking render bit-for-bit when speculation
    holds, (b) report validity via finish() -> None, and (c) hand back a
    corrected array via finish() when the group under-speculated."""
    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf.render import _SPEC_COUNTS, build_render_aux, render_views

    # 512 wide forces the tile branch; 24 rows (3 chunks of 4096) keeps
    # the repeated renders fast while still spanning multiple chunks
    cam = CameraConfig(width=512, height=24, fx=400.0, fy=400.0,
                       ppx=256.0, ppy=12.0)
    cfg = NerfConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    params["grid"] = params["grid"] + 0.5
    aux = build_render_aux(params, cfg)
    rot = jnp.eye(3)[None]
    org = jnp.asarray([[0.5, 0.5, -0.6]])
    _SPEC_COUNTS.clear()
    a1 = render_views(params, org, rot, cam, cfg, chunk=4096, aux=aux)
    # steady state: deferred render matches, finish() verifies valid
    d1, fin = render_views(params, org, rot, cam, cfg, chunk=4096, aux=aux,
                           defer=True)
    assert fin() is None
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(d1))
    # two deferred groups in flight back-to-back (the eval pipeline shape)
    d2, fin2 = render_views(params, org, rot, cam, cfg, chunk=4096, aux=aux,
                            defer=True)
    d3, fin3 = render_views(params, org, rot, cam, cfg, chunk=4096, aux=aux,
                            defer=True)
    assert fin2() is None and fin3() is None
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(d3))

    # under-speculation: poison the remembered counts (marked stable, so
    # no slack) far below the real survivor counts — finish() must detect
    # it and return the corrected render, identical to a fresh exact one
    key = next(iter(_SPEC_COUNTS))
    _SPEC_COUNTS[key] = (1, 1, 1, 0, True)
    d4, fin4 = render_views(params, org, rot, cam, cfg, chunk=4096,
                            aux=aux, defer=True)
    redo = fin4()
    assert redo is not None
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(redo))


@pytest.mark.slow  # two full train compiles (~48 s on the 1-core sandbox)
def test_train_warm_start(tmp_path):
    """train(init_from=...) continues from given params (mode 4's
    warm-started label sweep, modes.mode_instant_ngp warm_start_steps):
    the caller's tree must survive train_chunk's buffer donation, the
    flat warmup phase is skipped, and training actually moves the
    field from its initialization."""
    train_json, test_json, _, _ = write_scene(
        str(tmp_path), n_train=4, n_test=2, n_points=3000
    )
    cfg = dataclasses.replace(TINY, n_steps=40, train_coarse=8,
                              train_warmup_steps=20)
    params0, _ = train_nerf(train_json, cfg, seed=0)
    saved = {k: np.asarray(v).copy() for k, v in params0.items()}

    warm_cfg = dataclasses.replace(cfg, n_steps=30)
    params1, _ = train_nerf(train_json, warm_cfg, seed=1, init_from=params0)
    # donation safety: the caller's tree is untouched
    for k in saved:
        np.testing.assert_array_equal(saved[k], np.asarray(params0[k]))
    # and the warm run trained (params moved off the init)
    moved = sum(
        float(np.abs(np.asarray(params1[k]) - saved[k]).max()) for k in saved
    )
    assert moved > 0.0
    metrics = eval_nerf(params1, test_json, cfg)
    assert np.isfinite(metrics["PSNR"])


def test_adam_lowp_matches_fp32_trajectory():
    """bf16-moment Adam (adam_moment_dtype='bfloat16') stores both moments
    in bf16 but must track the fp32 optax trajectory closely on a smooth
    problem, and its state must actually be bf16 (the point: 2x less
    moment HBM traffic per step — artifacts/step_residue.json)."""
    import optax

    from nerf_prv_tpu.nerf.model import NerfConfig
    from nerf_prv_tpu.nerf.train import make_optimizer

    cfg32 = NerfConfig(adam_moment_dtype="float32")
    cfg16 = NerfConfig(adam_moment_dtype="bfloat16")
    target = jnp.asarray(np.linspace(-1.0, 1.0, 64), jnp.float32)

    def run(cfg):
        params = {"grid": jnp.zeros(64), "w": jnp.ones(4)}
        opt = make_optimizer(cfg)
        state = opt.init(params)
        for _ in range(50):
            grads = jax.grad(
                lambda p: jnp.mean((p["grid"] - target) ** 2)
                + jnp.mean(p["w"] ** 2)
            )(params)
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        return params, state

    p32, _ = run(cfg32)
    p16, s16 = run(cfg16)
    # moments really stored in bf16 (chain: [wd, adam, scale])
    adam_state = next(
        s for s in jax.tree_util.tree_leaves(
            s16, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        ) if isinstance(x := s, optax.ScaleByAdamState)
    )
    assert adam_state.mu["grid"].dtype == jnp.bfloat16
    assert adam_state.nu["grid"].dtype == jnp.bfloat16
    # trajectories agree to well under the quality gate's resolution
    err = float(jnp.max(jnp.abs(p32["grid"] - p16["grid"])))
    assert err < 5e-2, err
    # both converge toward the target
    assert float(jnp.mean(jnp.abs(p16["grid"] - target))) < 0.35


def test_adam_lowp_validation():
    from nerf_prv_tpu.nerf.model import NerfConfig

    with pytest.raises(ValueError, match="adam_moment_dtype"):
        NerfConfig(adam_moment_dtype="fp8")
