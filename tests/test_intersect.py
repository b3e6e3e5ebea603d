"""Intersection kernels vs a scalar port of crt_intersection.cpp."""

import numpy as np
import jax.numpy as jnp

from crt_tpu.ops import intersect, traverse
from crt_tpu.scene import accel as accel_mod


def ref_intersect_triangle(o, d, v0, v1, v2, backface=False):
    """Scalar port of crt_intersection.cpp:47-93 -> (t, u, v) or None."""
    o, d, v0, v1, v2 = (np.asarray(x, np.float64) for x in (o, d, v0, v1, v2))
    e0, e1, e2 = v1 - v0, v2 - v1, v0 - v2
    n = np.cross(v1 - v0, v2 - v0)
    n = n / np.linalg.norm(n)

    nd = n.dot(d)
    if abs(nd) < 1e-6:
        return None
    opd = n.dot(v0 - o)
    front = opd < 0.0
    if not front and backface:
        return None
    t = opd / nd
    if t < 0.0:
        return None
    p = o + d * t
    v0p, v1p, v2p = p - v0, p - v1, p - v2
    if n.dot(np.cross(e0, v0p)) >= 0 and n.dot(np.cross(e1, v1p)) >= 0 \
            and n.dot(np.cross(e2, v2p)) >= 0:
        v0v1 = e0
        v0v2 = -e2
        denom = np.linalg.norm(np.cross(v0v1, v0v2))
        u = np.linalg.norm(np.cross(v0p, v0v2)) / denom
        v = np.linalg.norm(np.cross(v0v1, v0p)) / denom
        return t, u, v
    return None


def random_soup(rng, T=64, spread=4.0, size=0.6):
    """Localized random triangles (centroid + jitter) — a spread of huge
    triangles would straddle every KD split and duplicate exponentially."""
    centers = rng.uniform(-spread, spread, size=(T, 1, 3))
    jitter = rng.uniform(-size, size, size=(T, 3, 3))
    verts = (centers + jitter).reshape(T * 3, 3).astype(np.float32)
    tri = np.arange(T * 3, dtype=np.int32).reshape(T, 3)
    return verts, tri


def brute_ref(origins, dirs, verts, tri, backface):
    """Reference closest-hit over all triangles (first-wins ties)."""
    out_t, out_i = [], []
    for o, d in zip(origins, dirs):
        best_t, best_i = np.inf, -1
        for j in range(len(tri)):
            r = ref_intersect_triangle(
                o, d, verts[tri[j, 0]], verts[tri[j, 1]], verts[tri[j, 2]],
                backface=backface[j],
            )
            if r is not None and r[0] < best_t:
                best_t, best_i = r[0], j
        out_t.append(best_t)
        out_i.append(best_i)
    return np.array(out_t), np.array(out_i)


def test_bruteforce_matches_scalar_reference():
    rng = np.random.default_rng(7)
    verts, tri = random_soup(rng, T=40)
    backface = rng.uniform(size=40) < 0.3

    R = 200
    origins = rng.uniform(-6, 6, size=(R, 3)).astype(np.float32)
    dirs = rng.normal(size=(R, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    td = intersect.build_triangle_data(
        jnp.asarray(verts), jnp.asarray(tri), jnp.asarray(backface)
    )
    hit = intersect.closest_hit_bruteforce(
        td, jnp.asarray(origins), jnp.asarray(dirs)
    )

    t_ref, i_ref = brute_ref(origins, dirs, verts, tri, backface)

    got_i = np.asarray(hit.tri)
    got_t = np.asarray(hit.t)
    # f32 vs f64 can flip knife-edge hits; demand near-total agreement.
    agree = got_i == i_ref
    assert agree.mean() > 0.98, f"only {agree.mean():.3f} agreement"
    hits = agree & (i_ref >= 0)
    np.testing.assert_allclose(got_t[hits], t_ref[hits], rtol=1e-3, atol=1e-4)


def test_tree_matches_bruteforce():
    rng = np.random.default_rng(11)
    verts, tri = random_soup(rng, T=300)
    backface = np.zeros(300, bool)

    R = 500
    origins = rng.uniform(-6, 6, size=(R, 3)).astype(np.float32)
    dirs = rng.normal(size=(R, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    td = intersect.build_triangle_data(
        jnp.asarray(verts), jnp.asarray(tri), jnp.asarray(backface)
    )
    brute = intersect.closest_hit_bruteforce(
        td, jnp.asarray(origins), jnp.asarray(dirs)
    )

    tree = accel_mod.build_accel_tree(verts, tri)
    tg = traverse.build_triangle_gather(
        jnp.asarray(verts), jnp.asarray(tri), jnp.asarray(backface)
    )
    treehit = traverse.closest_hit_tree(
        tree, tg, jnp.asarray(origins), jnp.asarray(dirs)
    )

    bt, bi = np.asarray(brute.t), np.asarray(brute.tri)
    tt, ti = np.asarray(treehit.t), np.asarray(treehit.tri)
    # Same hit distance everywhere (triangle ids may differ on exact ties).
    same_miss = (bi < 0) == (ti < 0)
    assert same_miss.all()
    hits = bi >= 0
    np.testing.assert_allclose(tt[hits], bt[hits], rtol=1e-5, atol=1e-6)
    assert (bi[hits] == ti[hits]).mean() > 0.99


def test_backface_culling():
    verts = np.array(
        [[-1, -1, -3], [1, -1, -3], [0, 1, -3]], np.float32
    )
    tri = np.array([[0, 1, 2]], np.int32)
    td_cull = intersect.build_triangle_data(
        jnp.asarray(verts), jnp.asarray(tri), jnp.asarray([True])
    )
    td_keep = intersect.build_triangle_data(
        jnp.asarray(verts), jnp.asarray(tri), jnp.asarray([False])
    )
    # From the front (origin at z=0 looking -z): CCW triangle faces +z.
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    assert int(intersect.closest_hit_bruteforce(td_cull, o, d).tri[0]) == 0
    # From behind, culled:
    o2 = jnp.asarray([[0.0, 0.0, -6.0]])
    d2 = jnp.asarray([[0.0, 0.0, 1.0]])
    assert int(intersect.closest_hit_bruteforce(td_cull, o2, d2).tri[0]) == -1
    assert int(intersect.closest_hit_bruteforce(td_keep, o2, d2).tri[0]) == 0
