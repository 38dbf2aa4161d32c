import os

import numpy as np
import pytest

from nerf_prv_tpu.planning import (
    CIRCLE_PATH,
    LINE_PATH,
    WRONG_PATH,
    GlobalPathPlanner,
    local_path,
    pairwise_lengths,
    solve_open_tsp,
    trajectory,
)
from nerf_prv_tpu.viewspace import (
    ViewSpace,
    generate_hemisphere,
    load_path_order,
    load_view_space,
    min_pairwise_angle,
    sample_novel_views,
    sum_pairwise_distance,
)

from conftest import REFERENCE_ROOT, requires_reference

REF_HEMI = os.path.join(REFERENCE_ROOT, "PRV_simulation", "Hemisphere")


# ------------------------------------------------------------- local path
def test_local_path_line_when_clear():
    mode, d = local_path([1, 0, 0.5], [0, 1, 0.5], [0, 0, 0], 0.1)
    assert mode == LINE_PATH
    assert d == pytest.approx(np.sqrt(2.0))


def test_local_path_arc_when_blocked():
    # straight segment passes through the obstacle center
    mode, d = local_path([-1, 0, 0], [1, 0, 0], [0, 0, 0], 0.5)
    assert mode == CIRCLE_PATH
    # analytic: two tangent legs sqrt(1-r^2)... here chord through center:
    # legs (1-r) each + half-circumference arc pi*r
    assert d == pytest.approx((1 - 0.5) * 2 + np.pi * 0.5, rel=1e-6)
    assert d > 2.0  # longer than the blocked straight line


def test_local_path_wrong_when_endpoint_inside():
    mode, d = local_path([0, 0, 0.1], [1, 0, 0], [0, 0, 0], 0.5)
    assert mode == WRONG_PATH
    assert d >= 1e9


def test_pairwise_matches_scalar():
    rng = np.random.default_rng(3)
    views = rng.normal(size=(12, 3))
    views /= np.linalg.norm(views, axis=1, keepdims=True)
    center = np.array([1e-10, 1e-10, 1e-10])
    r = 0.5
    mat = np.asarray(pairwise_lengths(views, center, r))
    for i in range(12):
        for j in range(12):
            if i == j:
                continue
            _, d = local_path(views[i], views[j], center, r)
            assert mat[i, j] == pytest.approx(d, rel=1e-4), (i, j)


def test_trajectory_line_waypoints():
    num, pts = trajectory([0, 0, 1], [0, 1, 1], [0, 0, 0], 0.2, 0.3)
    assert num == -2  # line
    assert np.allclose(pts[-1], [0, 1, 1])


def test_trajectory_arc_endpoint_and_monotone():
    num, pts = trajectory([-1, 0, 0.3], [1, 0, 0.3], [0, 0, 0], 0.8, 0.05)
    assert num > 0
    assert np.allclose(pts[-1], [1, 0, 0.3], atol=1e-9)
    # all waypoints stay outside the obstacle (tiny numeric slack)
    dists = np.linalg.norm(np.array(pts), axis=1)
    assert dists.min() >= 0.8 - 1e-6


# ------------------------------------------------------------------- TSP
def test_held_karp_vs_bruteforce():
    from itertools import permutations

    rng = np.random.default_rng(4)
    n = 7
    pts = rng.normal(size=(n, 3))
    dist = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    order = solve_open_tsp(dist, start=0)
    got = dist[np.array(order[:-1]), np.array(order[1:])].sum()
    best = min(
        sum(dist[p[i], p[i + 1]] for i in range(n - 1))
        for p in permutations(range(1, n))
        for p in [(0,) + p]
    )
    assert got == pytest.approx(best)
    assert order[0] == 0 and sorted(order) == list(range(n))


def test_heuristic_close_to_exact():
    rng = np.random.default_rng(5)
    n = 12
    pts = rng.normal(size=(n, 3))
    dist = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    exact = solve_open_tsp(dist, start=0, exact_max=13)
    heur = solve_open_tsp(dist, start=0, exact_max=2)
    c_exact = dist[np.array(exact[:-1]), np.array(exact[1:])].sum()
    c_heur = dist[np.array(heur[:-1]), np.array(heur[1:])].sum()
    assert c_heur <= c_exact * 1.05


# ------------------------------------------------------- hemisphere packing
def test_generate_hemisphere_has_pole_and_good_packing():
    pts = generate_hemisphere(16, seed=0, restarts=4, steps=300)
    assert pts.shape == (16, 3)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-6)
    assert (pts[:, 2] >= -1e-9).all()
    np.testing.assert_allclose(pts[0], [0, 0, 1], atol=1e-9)
    assert min_pairwise_angle(pts) > np.deg2rad(20)


@requires_reference
def test_generated_packing_close_to_reference_dispersion():
    ref = load_view_space(REF_HEMI, 16)
    ours = generate_hemisphere(16, seed=0, restarts=8, steps=600)
    assert sum_pairwise_distance(ours) >= 0.97 * sum_pairwise_distance(ref)


@requires_reference
def test_view_space_placement_matches_reference_semantics():
    ref = load_view_space(REF_HEMI, 5)
    obj = np.random.default_rng(0).normal(scale=0.02, size=(100, 3))
    vs = ViewSpace(ref, obj, radius=0.3)
    # all views at radius 0.3 * |row|/|row0| around the centroid
    d = np.linalg.norm(vs.views - vs.object_center, axis=1)
    rows = np.linalg.norm(ref, axis=1)
    keep = ref[:, 2] >= 0
    np.testing.assert_allclose(d, 0.3 * rows[keep] / rows[0], rtol=1e-9)
    top = vs.top_view_id()
    np.testing.assert_allclose(
        vs.views[top], vs.object_center + [0, 0, 0.3], atol=1e-5
    )


@requires_reference
def test_tsp_beats_or_matches_reference_paths():
    # evaluate both paths under our metric; ours must not be worse
    for n in (10, 20, 40):
        views = load_view_space(REF_HEMI, n)
        ref_order = load_path_order(REF_HEMI, n)
        assert sorted(ref_order) == list(range(n))
        start = int(np.argmin(np.linalg.norm(views - [0, 0, 1], axis=1)))
        assert ref_order[0] == start
        planner = GlobalPathPlanner(
            views, list(range(n)), np.zeros(3), 0.5 * np.linalg.norm(views[0]), start
        )
        ours = planner.solve()
        idx = np.asarray(ref_order)
        ref_cost = planner.dist[
            [list(ref_order).index(i) for i in idx[:-1]],
            [list(ref_order).index(i) for i in idx[1:]],
        ].sum() if False else float(
            np.sum(
                [
                    planner.dist[ref_order[i], ref_order[i + 1]]
                    for i in range(n - 1)
                ]
            )
        )
        assert ours <= ref_cost * 1.02, (n, ours, ref_cost)


@pytest.mark.slow
@requires_reference
def test_tsp_full_sweep_all_shipped_paths():
    """Sweep EVERY shipped ``N_path.txt`` (98 sizes, 3..100): our planner's
    cost must never exceed the reference's Gurobi-exact path cost by >1%
    under our metric (≙ mode 20, main.cpp:3622-3833).

    Measured 2026-08-17 with EXACT_MAX=16 + 4-restart/3-kick local search:
    worst ratio ours/ref = 1.0043 (n=55); most sizes strictly better
    because the reference costs are evaluated under the same local-path
    metric our planner optimizes.  (The pre-restart heuristic peaked at
    1.037 @ n=23 — the restarts are load-bearing.)
    """
    import glob

    sizes = sorted(
        int(os.path.basename(p).split("_")[0])
        for p in glob.glob(os.path.join(REF_HEMI, "*_path.txt"))
    )
    assert len(sizes) == 98, len(sizes)
    worst = (0.0, None)
    for n in sizes:
        views = load_view_space(REF_HEMI, n)
        ref_order = load_path_order(REF_HEMI, n)
        assert sorted(ref_order) == list(range(n)), n
        start = int(np.argmin(np.linalg.norm(views - [0, 0, 1], axis=1)))
        planner = GlobalPathPlanner(
            views, list(range(n)), np.zeros(3), 0.5 * np.linalg.norm(views[0]), start
        )
        ours = planner.solve()
        ref_cost = float(
            np.sum([planner.dist[ref_order[i], ref_order[i + 1]] for i in range(n - 1)])
        )
        ratio = ours / ref_cost
        if ratio > worst[0]:
            worst = (ratio, n)
        assert ratio <= 1.01, (n, ours, ref_cost)
    assert worst[0] <= 1.01, worst


@pytest.mark.slow
def test_tsp_heuristic_vs_held_karp_at_exactness_boundary():
    """At the exactness boundary (n=14..16, now inside EXACT_MAX=16) the
    restart heuristic must stay within 2% of exact Held-Karp on
    hemisphere-like instances — quantifying what switching off exactness
    would cost (≙ Gurobi-exact main.cpp:398-594).  These sizes are solved
    exactly in production; this bounds the heuristic's gap just past any
    future EXACT_MAX reduction."""
    from nerf_prv_tpu.planning.local_path import pairwise_lengths
    from nerf_prv_tpu.planning.tsp import _held_karp_path, _path_cost, solve_open_tsp

    worst = 0.0
    for n in (14, 15, 16):
        views = generate_hemisphere(n, seed=n, restarts=2, steps=200) * 0.3
        dist = np.array(pairwise_lengths(views, np.zeros(3) + 1e-10, 0.15), np.float64)
        np.fill_diagonal(dist, 0.0)
        start = int(np.argmin(np.linalg.norm(views - [0, 0, 0.3], axis=1)))
        exact = _held_karp_path(dist, start)
        heur = solve_open_tsp(dist, start, exact_max=13)  # force the heuristic
        c_exact = _path_cost(dist, exact)
        c_heur = _path_cost(dist, heur)
        worst = max(worst, c_heur / c_exact)
        assert c_heur <= c_exact * 1.02, (n, c_heur, c_exact)
    assert worst <= 1.02, worst
    # and the production path at these sizes IS exact
    views = generate_hemisphere(15, seed=3, restarts=2, steps=200) * 0.3
    dist = np.array(pairwise_lengths(views, np.zeros(3) + 1e-10, 0.15), np.float64)
    np.fill_diagonal(dist, 0.0)
    exact = _held_karp_path(dist, 0)
    assert solve_open_tsp(dist, 0) == exact


def test_sample_novel_views_disjoint_hemisphere():
    pts = sample_novel_views(50, seed=1, restarts=64)
    assert pts.shape == (50, 3)
    assert (pts[:, 2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-6)
