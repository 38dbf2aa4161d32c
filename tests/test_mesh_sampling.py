import os

import numpy as np
import pytest
from PIL import Image

from nerf_prv_tpu.scene.mesh_sampling import (
    is_textured,
    load_obj,
    remove_duplicate_faces,
    sample_and_voxelize,
    sample_mesh,
)
from nerf_prv_tpu.scene.ply import load_ply


def _write_cube_obj(d, with_texture=True, duplicate_faces=False):
    """Unit cube with a red/blue checker texture on all faces."""
    tex = np.zeros((32, 32, 3), np.uint8)
    tex[:16] = [255, 0, 0]
    tex[16:] = [0, 0, 255]
    Image.fromarray(tex).save(os.path.join(d, "tex.png"))
    with open(os.path.join(d, "mat.mtl"), "w") as f:
        f.write("newmtl main\nKd 0.5 0.5 0.5\n")
        if with_texture:
            f.write("map_Kd tex.png\n")
    v = [
        (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
        (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
    ]
    quads = [
        (1, 2, 3, 4), (5, 8, 7, 6), (1, 5, 6, 2),
        (2, 6, 7, 3), (3, 7, 8, 4), (5, 1, 4, 8),
    ]
    path = os.path.join(d, "model_normalized.obj")
    with open(path, "w") as f:
        f.write("mtllib mat.mtl\n")
        for p in v:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        f.write("vt 0.25 0.25\nvt 0.75 0.25\nvt 0.75 0.75\nvt 0.25 0.75\n")
        f.write("usemtl main\n")
        for q in quads:
            f.write(f"f {q[0]}/1 {q[1]}/2 {q[2]}/3 {q[3]}/4\n")
        if duplicate_faces:
            for q in quads[:2]:
                f.write(f"f {q[0]}/1 {q[1]}/2 {q[2]}/3 {q[3]}/4\n")
    return path


def test_load_obj_triangulates_and_reads_materials(tmp_path):
    path = _write_cube_obj(str(tmp_path))
    mesh = load_obj(path)
    assert len(mesh.vertices) == 8
    assert len(mesh.faces) == 12  # 6 quads fan-triangulated
    assert is_textured(mesh)
    assert mesh.uvs is not None and len(mesh.uvs) == 4


def test_remove_duplicate_faces(tmp_path):
    path = _write_cube_obj(str(tmp_path), duplicate_faces=True)
    mesh = load_obj(path)
    assert len(mesh.faces) == 16
    clean = remove_duplicate_faces(mesh)
    assert len(clean.faces) == 12


def test_remove_near_duplicate_offset_and_rewound_faces():
    """Offset duplicates (re-listed vertices a hair apart) and rewound
    duplicates z-fight in real ShapeNet exports; both must collapse to ONE
    kept face — the outward-facing copy (≙ the keep-max-AO rule,
    mesh_sampling_geo_color_shapenet.py:52-57)."""
    from nerf_prv_tpu.scene.mesh_sampling import Mesh

    eps = 1e-8
    # interior anchor point pulls the mesh centroid below the triangle so
    # outwardness is well-defined (+z normal faces away from the centroid)
    verts = np.array(
        [
            [0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [0.0, 1.0, 1.0],   # face A (+z winding)
            [eps, 0.0, 1.0 + eps], [1.0, eps, 1.0], [0.0, 1.0, 1.0 - eps],  # offset copy
            [0.5, 0.5, 0.0],  # anchor
        ]
    )
    faces = np.array(
        [
            [0, 2, 1],   # rewound duplicate of A (normal -z, inward) — drop
            [3, 4, 5],   # offset duplicate (normal +z, outward)      — keep
            [0, 1, 2],   # original (+z) — same group, lower index than 1 but
                         # equal outward score up to eps: either +z copy ok
            [0, 1, 6],   # unrelated face — keep
        ]
    )
    mesh = Mesh(
        vertices=verts, faces=faces, uvs=None, face_uvs=None,
        face_materials=np.zeros(4, np.int64), materials=[],
    )
    clean = remove_duplicate_faces(mesh)
    assert len(clean.faces) == 2, clean.faces
    kept_groups = {tuple(sorted(f)) for f in clean.faces.tolist()}
    assert (0, 1, 6) in kept_groups
    # the kept duplicate is one of the outward (+z) copies, not the rewound one
    other = next(f for f in clean.faces.tolist() if tuple(sorted(f)) != (0, 1, 6))
    v = clean.vertices
    n = np.cross(v[other[1]] - v[other[0]], v[other[2]] - v[other[0]])
    assert n[2] > 0, other

    # degenerate sliver (two coincident snapped vertices) is dropped
    mesh2 = Mesh(
        vertices=np.array([[0, 0, 0], [1.0, 0, 0], [1.0 + 1e-9, 1e-9, 0], [0, 1.0, 0]]),
        faces=np.array([[0, 1, 2], [0, 1, 3]]),
        uvs=None, face_uvs=None, face_materials=np.zeros(2, np.int64), materials=[],
    )
    clean2 = remove_duplicate_faces(mesh2)
    assert clean2.faces.tolist() == [[0, 1, 3]]


def test_sample_mesh_points_on_surface_with_texture_colors(tmp_path):
    mesh = load_obj(_write_cube_obj(str(tmp_path)))
    pts, cols = sample_mesh(mesh, n_points=5000, seed=0)
    assert pts.shape == (5000, 3) and cols.shape == (5000, 3)
    # all points on the cube surface: at least one coord at 0 or 1
    on_face = (np.isclose(pts, 0, atol=1e-9) | np.isclose(pts, 1, atol=1e-9)).any(1)
    assert on_face.all()
    # texture colors: red and blue both sampled (uv range straddles checker)
    assert (cols[:, 0] > 200).any() and (cols[:, 2] > 200).any()


def test_sample_mesh_kd_fallback_without_texture(tmp_path):
    mesh = load_obj(_write_cube_obj(str(tmp_path), with_texture=False))
    pts, cols = sample_mesh(mesh, n_points=100, seed=0)
    np.testing.assert_allclose(cols, 127, atol=2)  # Kd 0.5 -> ~127


def test_sample_and_voxelize_end_to_end(tmp_path):
    obj = _write_cube_obj(str(tmp_path))
    out = str(tmp_path / "model_normalized_sample.ply")
    ok = sample_and_voxelize(obj, out, n_points=20000, grid_resolution=64)
    assert ok and os.path.exists(out)
    pts, cols = load_ply(out)
    assert len(pts) > 1000
    assert cols is not None
    # voxel thinning: no two points in the same 1/64 cell
    keys = np.floor(pts / ((pts.max(0) - pts.min(0)).max() / 64)).astype(int)
    assert len(np.unique(keys, axis=0)) == len(keys)


def test_require_texture_gate(tmp_path):
    obj = _write_cube_obj(str(tmp_path), with_texture=False)
    out = str(tmp_path / "s.ply")
    assert not sample_and_voxelize(obj, out, n_points=100, require_texture=True)
    assert not os.path.exists(out)
