import os
import subprocess
import threading
import time

import numpy as np
import pytest

from nerf_prv_tpu.runtime import native
from nerf_prv_tpu.scene import save_ply_ascii, save_ply_binary
from nerf_prv_tpu.scene.ply import _load_ply_py
from nerf_prv_tpu.scene.voxel import voxel_downsample

CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not os.path.exists(os.path.join(CSRC, "libprv_runtime.so")):
        try:
            subprocess.run(["make", "-C", CSRC], check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            pytest.skip("native toolchain unavailable")
    # reset cached handle so the freshly built lib is picked up
    native._TRIED = False
    native._LIB = None
    if not native.available():
        pytest.skip("native runtime failed to load")


def _cloud(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.uniform(-0.1, 0.1, (n, 3)),
        rng.integers(0, 255, (n, 3), dtype=np.uint8),
    )


def test_native_ply_matches_python_binary(tmp_path):
    pts, cols = _cloud()
    p = str(tmp_path / "c.ply")
    save_ply_binary(p, pts, cols)
    n_pts, n_cols = native.load_ply(p)
    p_pts, p_cols = _load_ply_py(p)
    np.testing.assert_allclose(n_pts, p_pts, atol=1e-7)
    np.testing.assert_array_equal(n_cols, p_cols)


def test_native_ply_matches_python_ascii(tmp_path):
    pts, cols = _cloud(seed=1)
    p = str(tmp_path / "a.ply")
    save_ply_ascii(p, pts, cols)
    n_pts, n_cols = native.load_ply(p)
    p_pts, p_cols = _load_ply_py(p)
    np.testing.assert_allclose(n_pts, p_pts, atol=1e-6)
    np.testing.assert_array_equal(n_cols, p_cols)


def test_native_voxel_first_win_matches_numpy():
    pts, _ = _cloud(5000, seed=2)
    res = 0.01
    keep = native.voxel_first_win(pts, res)
    _, _, keys = voxel_downsample(pts, None, res)
    assert len(keep) == len(keys)
    # first-win property: each kept index is the first of its voxel
    kept_keys = np.floor(pts[keep] / res).astype(np.int64)
    assert len(np.unique(kept_keys, axis=0)) == len(keep)


def test_native_white_to_alpha():
    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[0, 0] = 255  # white -> transparent
    rgb[1, 1] = [255, 255, 254]  # not white
    rgba = native.white_to_alpha(rgb)
    assert rgba[0, 0, 3] == 0
    assert rgba[1, 1, 3] == 255
    assert rgba[2, 2, 3] == 255
    np.testing.assert_array_equal(rgba[..., :3], rgb)


def test_native_poll_and_touch(tmp_path):
    target = str(tmp_path / "ready.txt")
    assert not native.poll_file(target, interval_ms=10, timeout_ms=50)

    def later():
        time.sleep(0.1)
        native.touch(target)

    t = threading.Thread(target=later)
    t.start()
    assert native.poll_file(target, interval_ms=10, timeout_ms=3000)
    t.join()
    assert os.path.exists(target)
