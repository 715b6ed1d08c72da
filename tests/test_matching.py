"""Matching kernels vs a scalar numpy oracle transcribing the CUDA semantics
(matching_kernels.cu) on tiny inputs."""

import jax
import jax.numpy as jnp
import numpy as np

from frodo_slam_tpu.ops import matching
from frodo_slam_tpu.ops.image import img_gradient


def np_bilinear(img, u, v):
    u0, v0 = int(np.floor(u)), int(np.floor(v))
    du, dv = u - u0, v - v0
    return (
        img[v0, u0] * (1 - du) * (1 - dv)
        + img[v0, u0 + 1] * du * (1 - dv)
        + img[v0 + 1, u0] * (1 - du) * dv
        + img[v0 + 1, u0 + 1] * du * dv
    )


def np_iter_proj(rays_img, pts3d_norm, p_init, max_iter, lam0, cost_thresh):
    """Scalar transcription of iter_proj_kernel (matching_kernels.cu:128-284)."""
    h, w, _ = rays_img.shape
    n = p_init.shape[0]
    p_out = np.zeros((n, 2), np.float32)
    conv = np.zeros(n, bool)
    for k in range(n):
        u = min(max(p_init[k, 0], 1.0), w - 2.0)
        v = min(max(p_init[k, 1], 1.0), h - 2.0)
        lam = lam0
        converged = False
        for _ in range(max_iter):
            s = np_bilinear(rays_img, u, v)
            r, gx, gy = s[0:3].copy(), s[3:6], s[6:9]
            r /= np.linalg.norm(r)
            err = r - pts3d_norm[k]
            cost = float(err @ err)
            A00 = gx @ gx + lam
            A01 = gx @ gy
            A11 = gy @ gy + lam
            b0 = -(err @ gx)
            b1 = -(err @ gy)
            det_inv = 1.0 / (A00 * A11 - A01 * A01)
            du = det_inv * (A11 * b0 - A01 * b1)
            dv = det_inv * (-A01 * b0 + A00 * b1)
            u_new = min(max(u + du, 1.0), w - 2.0)
            v_new = min(max(v + dv, 1.0), h - 2.0)
            s = np_bilinear(rays_img, u_new, v_new)
            r = s[0:3] / np.linalg.norm(s[0:3])
            err = r - pts3d_norm[k]
            new_cost = float(err @ err)
            if new_cost < cost:
                u, v = u_new, v_new
                lam *= 0.1
                converged = new_cost < cost_thresh
            else:
                lam *= 10.0
                converged = cost < cost_thresh
        p_out[k] = (u, v)
        conv[k] = converged
    return p_out, conv


def np_refine(D11, D21, p1, radius, dilation_max):
    """Scalar transcription of refine_matches_kernel (matching_kernels.cu:25-85)."""
    h, w, f = D11.shape
    n = p1.shape[0]
    p_new = np.zeros((n, 2), np.int64)
    scores = np.zeros(n, np.float32)
    for k in range(n):
        u0, v0 = int(p1[k, 0]), int(p1[k, 1])
        best = -np.inf
        ub, vb = u0, v0
        for d in range(dilation_max, 0, -1):
            rd = radius * d
            for i in range(0, 2 * rd + 1, d):
                for j in range(0, 2 * rd + 1, d):
                    u = u0 - rd + i
                    v = v0 - rd + j
                    if 0 <= u < w and 0 <= v < h:
                        sc = float(D21[k] @ D11[v, u])
                        if sc > best:
                            best = sc
                            ub, vb = u, v
            u0, v0 = ub, vb
        p_new[k] = (ub, vb)
        scores[k] = best
    return p_new, scores


def make_scene(h=12, w=16, seed=0):
    rng = np.random.default_rng(seed)
    # smooth pointmap: pixel rays with varying depth
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    X = np.stack(
        [(uu - w / 2) / w, (vv - h / 2) / h, np.ones_like(uu)], axis=-1
    )
    X *= (2.0 + 0.1 * np.sin(uu / 3) * np.cos(vv / 2))[..., None]
    X += rng.normal(size=X.shape).astype(np.float32) * 0.003
    return X.astype(np.float32)


def test_iter_proj_matches_oracle():
    h, w = 12, 16
    X11 = make_scene(h, w, 0)
    X21 = make_scene(h, w, 1) * 1.02

    rays_with_grad, pts3d_norm, p_init = matching.prep_for_iter_proj(
        jnp.asarray(X11)[None], jnp.asarray(X21)[None], None
    )
    p, conv = matching.iter_proj(
        rays_with_grad, pts3d_norm, p_init, max_iter=10,
        lambda_init=1e-8, cost_thresh=1e-6,
    )
    p_np, conv_np = np_iter_proj(
        np.asarray(rays_with_grad[0]), np.asarray(pts3d_norm[0]),
        np.asarray(p_init[0]), 10, 1e-8, 1e-6,
    )
    # f32 (jax) vs f64 (oracle) accept/reject ties can leave a handful of
    # points one LM step apart; require near-exact agreement on the rest.
    close = np.abs(np.asarray(p[0]) - p_np) <= 2e-3
    assert close.all(axis=-1).mean() > 0.98
    assert (np.asarray(conv[0]) == conv_np).mean() > 0.97


def test_refine_matches_oracle():
    h, w, f = 10, 14, 8
    rng = np.random.default_rng(3)
    D11 = rng.normal(size=(h, w, f)).astype(np.float32)
    D11 /= np.linalg.norm(D11, axis=-1, keepdims=True)
    n = h * w
    # queries: noisy copies of random locations
    locs = np.stack([rng.integers(0, w, n), rng.integers(0, h, n)], axis=-1)
    D21 = D11[locs[:, 1], locs[:, 0]] + rng.normal(size=(n, f)).astype(np.float32) * 0.05
    p1 = np.clip(locs + rng.integers(-2, 3, size=(n, 2)), 0, [w - 1, h - 1])

    p_new, scores = matching.refine_matches_gather(
        jnp.asarray(D11)[None], jnp.asarray(D21)[None],
        jnp.asarray(p1)[None], radius=2, dilation_max=3,
    )
    p_np, s_np = np_refine(D11, D21, p1, 2, 3)
    np.testing.assert_array_equal(np.asarray(p_new[0]), p_np)
    np.testing.assert_allclose(np.asarray(scores[0]), s_np, atol=1e-4)


def test_refine_matches_shift_matches_gather():
    """The scatter+shift formulation must agree with the gather oracle when
    query centers are collision-free (a permutation of pixels)."""
    h, w, f = 10, 14, 8
    rng = np.random.default_rng(5)
    D11 = rng.normal(size=(h, w, f)).astype(np.float32)
    D11 /= np.linalg.norm(D11, axis=-1, keepdims=True)
    n = h * w
    perm = rng.permutation(n)
    p1 = np.stack([perm % w, perm // w], axis=-1).astype(np.int64)
    D21 = rng.normal(size=(n, f)).astype(np.float32)
    D21 /= np.linalg.norm(D21, axis=-1, keepdims=True)

    ps, ss = matching.refine_matches_shift(
        jnp.asarray(D11)[None], jnp.asarray(D21)[None], jnp.asarray(p1)[None],
        radius=2, dilation_max=3, dtype=jnp.float32,
    )
    ps0, ss0 = np.asarray(ps[0]), np.asarray(ss[0])
    # every returned score is a GENUINE descriptor dot at the returned pixel
    true_sc = (D11[ps0[:, 1], ps0[:, 0]] * D21).sum(-1)
    np.testing.assert_allclose(ss0, true_sc, atol=1e-5)
    # at least as good as the center probe each query was seeded with
    center = (D11[p1[:, 1], p1[:, 0]] * D21).sum(-1)
    assert (ss0 >= center - 1e-5).all()
    # positions stay within the total reachable window
    reach = 2 * (3 + 2 + 1)  # radius * sum(dilations)
    assert (np.abs(ps0 - p1) <= reach).all()

    # production path computes the dots in bf16 (the reference kernel uses
    # fp16): same guarantees at bf16 tolerance
    psb, ssb = matching.refine_matches_shift(
        jnp.asarray(D11)[None], jnp.asarray(D21)[None], jnp.asarray(p1)[None],
        radius=2, dilation_max=3,
    )
    psb0, ssb0 = np.asarray(psb[0]), np.asarray(ssb[0])
    true_b = (D11[psb0[:, 1], psb0[:, 0]] * D21).sum(-1)
    np.testing.assert_allclose(ssb0, true_b, atol=2e-2)
    assert (ssb0 >= center - 2e-2).all()
    assert (np.abs(psb0 - p1) <= reach).all()


def test_refine_matches_shift_exact_on_identity():
    """Collision-free case (self-match at identity centers): shift == gather
    exactly."""
    h, w, f = 10, 14, 8
    rng = np.random.default_rng(6)
    D11 = rng.normal(size=(h, w, f)).astype(np.float32)
    D11 /= np.linalg.norm(D11, axis=-1, keepdims=True)
    n = h * w
    p1 = np.stack([np.arange(n) % w, np.arange(n) // w], axis=-1).astype(np.int64)
    D21 = D11.reshape(n, f)

    pg, sg = matching.refine_matches_gather(
        jnp.asarray(D11)[None], jnp.asarray(D21)[None], jnp.asarray(p1)[None],
        radius=2, dilation_max=3,
    )
    ps, ss = matching.refine_matches_shift(
        jnp.asarray(D11)[None], jnp.asarray(D21)[None], jnp.asarray(p1)[None],
        radius=2, dilation_max=3, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(ss[0]), np.asarray(sg[0]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ps[0]), np.asarray(pg[0]))


def test_refine_matches_fused_identity_exact():
    """Fused-pyramid kernel chain (ops/refine_fused_pallas.py), interpret
    mode: on the collision-free self-match (centers = own pixel, queries =
    the image's own descriptors) nothing moves and the result equals the
    gather oracle exactly — every query's best probe is itself."""
    from frodo_slam_tpu.ops.refine_fused_pallas import refine_matches_fused

    rng = np.random.default_rng(8)
    h, w, f = 16, 32, 8
    D11 = rng.normal(size=(1, h, w, f)).astype(np.float32)
    D11 /= np.linalg.norm(D11, axis=-1, keepdims=True)
    n = h * w
    p1 = np.stack([np.arange(n) % w, np.arange(n) // w], axis=-1)[None]
    D21 = D11.reshape(1, n, f)

    pg, sg = matching.refine_matches_gather(
        jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p1),
        radius=2, dilation_max=3,
    )
    pf, sf = refine_matches_fused(
        jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p1),
        radius=2, dilation_max=3, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(pf), np.asarray(pg))
    np.testing.assert_allclose(np.asarray(sf), np.asarray(sg), atol=2e-2)


def test_refine_matches_fused_many_to_one():
    """The plane representation must not break MANY-TO-ONE matching: a
    query whose best probe is another query's (stationary) center still
    reports that destination — via the carried-best readout (and the ghost
    plane when evicted mid-pyramid)."""
    from frodo_slam_tpu.ops.refine_fused_pallas import refine_matches_fused

    h, w, f = 16, 32, 8
    D11 = np.zeros((1, h, w, f), np.float32)
    D11[0, 5, 5, 0] = 0.5   # q0's seeded center
    D11[0, 5, 6, 0] = 1.0   # q0's true peak — another query's home pixel
    n = h * w
    D21 = np.zeros((1, n, f), np.float32)
    D21[0, 0, 0] = 1.0
    p = np.stack([np.arange(n) % w, np.arange(n) // w], -1)[None].astype(np.int32)
    p[0, 0] = [5, 5]
    p[0, 5 * w + 5] = [0, 0]  # keep seeds injective

    pf, sf = refine_matches_fused(
        jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p),
        radius=1, dilation_max=1, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(pf)[0, 0], [6, 5])
    np.testing.assert_allclose(float(np.asarray(sf)[0, 0]), 1.0, atol=2e-2)


def test_refine_matches_fused_injective_seeds_match_shift():
    """Injective seeds (a uniform in-image wrap-shift of the pixel grid),
    random descriptor landscape: the fused pyramid must agree with the
    per-level shift formulation on a large majority of queries and at
    equal match quality. Exact parity is not expected — mid-pyramid
    contests resolve by probe order here vs scatter order there, and the
    divergent picks are equal-quality alternates (asserted via the mean
    score)."""
    from frodo_slam_tpu.ops.refine_fused_pallas import refine_matches_fused

    rng = np.random.default_rng(9)
    b, h, w, f = 2, 16, 32, 24
    D11 = rng.normal(size=(b, h, w, f)).astype(np.float32)
    D11 /= np.linalg.norm(D11, axis=-1, keepdims=True)
    D21 = rng.normal(size=(b, h * w, f)).astype(np.float32)
    D21 /= np.linalg.norm(D21, axis=-1, keepdims=True)
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    grid = np.stack([uu.ravel(), vv.ravel()], -1)[None].repeat(b, 0)
    p = np.stack(
        [(grid[..., 0] + 2) % w, (grid[..., 1] + 1) % h], -1
    ).astype(np.int32)

    pf, sf = refine_matches_fused(
        jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p),
        radius=2, dilation_max=3, interpret=True,
    )
    ps, ss = matching.refine_matches_shift(
        jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p),
        radius=2, dilation_max=3,
    )
    same = (np.asarray(ps) == np.asarray(pf)).all(-1)
    assert same.mean() > 0.7, same.mean()
    # equal match quality where they diverge: mean scores within bf16 dot
    # tolerance of each other
    assert abs(np.asarray(sf).mean() - np.asarray(ss).mean()) < 0.02


def test_refine_matches_fused_collision_semantics():
    """Worst-case collision regime (iid +-2 center perturbation: ~1/3 of
    queries contest a pixel): fused results keep the contract — every score
    is a genuine descriptor dot at the returned pixel, >= the center seed,
    within the pyramid reach — and collision losers degrade to their seed
    (one-shot truncation, module docstring) rather than to wrong answers.
    Real matcher flows are near-injective; this regime bounds the damage."""
    from frodo_slam_tpu.ops.refine_fused_pallas import refine_matches_fused

    rng = np.random.default_rng(9)
    b, h, w, f = 2, 16, 32, 24
    D11 = rng.normal(size=(b, h, w, f)).astype(np.float32)
    D11 /= np.linalg.norm(D11, axis=-1, keepdims=True)
    D21 = rng.normal(size=(b, h * w, f)).astype(np.float32)
    D21 /= np.linalg.norm(D21, axis=-1, keepdims=True)
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    p = np.stack([uu.ravel(), vv.ravel()], -1)[None].repeat(b, 0)
    p = np.clip(p + rng.integers(-2, 3, p.shape), 0, [w - 1, h - 1]).astype(np.int32)

    pf, sf = refine_matches_fused(
        jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p),
        radius=2, dilation_max=3, interpret=True,
    )
    pf0, sf0 = np.asarray(pf), np.asarray(sf)
    # genuine scores at the returned pixels (bf16 probe tolerance)
    for k in range(b):
        true_sc = (D11[k][pf0[k, :, 1], pf0[k, :, 0]] * D21[k]).sum(-1)
        np.testing.assert_allclose(sf0[k], true_sc, atol=2e-2)
        center = (D11[k][p[k, :, 1], p[k, :, 0]] * D21[k]).sum(-1)
        assert (sf0[k] >= center - 2e-2).all()
    reach = 2 * (3 + 2 + 1)
    assert (np.abs(pf0 - p) <= reach).all()

    # survivors refine like the shift formulation; initial-scatter losers
    # keep seeds. Position agreement tracks the survivor fraction —
    # require a clear majority even in this worst case.
    ps, ss = matching.refine_matches_shift(
        jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p),
        radius=2, dilation_max=3,
    )
    same = (np.asarray(ps) == pf0).all(-1)
    assert same.mean() > 0.6, same.mean()
    np.testing.assert_allclose(
        sf0[same], np.asarray(ss)[same], atol=2e-2)


def test_img_gradient_matches_conv():
    rng = np.random.default_rng(5)
    img = rng.normal(size=(1, 9, 11, 3)).astype(np.float32)
    gx, gy = img_gradient(jnp.asarray(img))
    # scalar check at an interior pixel
    k = np.array([[-3.0, 0, 3], [-10, 0, 10], [-3, 0, 3]]) / 32.0
    patch = img[0, 3:6, 4:7, 1]
    np.testing.assert_allclose(np.asarray(gx[0, 4, 5, 1]), (patch * k).sum(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy[0, 4, 5, 1]), (patch * k.T).sum(), atol=1e-5)


def test_match_end_to_end_identity():
    """Matching a pointmap against itself with identical descriptors should
    return (nearly) the identity correspondence with high validity."""
    h, w = 12, 16
    X = make_scene(h, w, 7)
    rng = np.random.default_rng(8)
    D = rng.normal(size=(h, w, 8)).astype(np.float32)
    D /= np.linalg.norm(D, axis=-1, keepdims=True)
    # dilation_max=1: with spatially-uncorrelated random descriptors a dilated
    # coarse level can wander off (true of the reference kernel too); the
    # dense level guarantees recovery of the identity.
    idx, valid = matching.match(
        jnp.asarray(X)[None], jnp.asarray(X)[None],
        jnp.asarray(D)[None], jnp.asarray(D)[None],
        radius=2, dilation_max=1, dist_thresh=0.5, ft_matching_threshold=0.8,
    )
    ident = np.arange(h * w)
    # interior only: border queries get clamped inward by iter_proj (exactly
    # like the CUDA kernel) and the shift refiner doesn't recover them (a
    # ~1% effect at production resolution, dominant on a 12x16 toy grid)
    inner = np.zeros((h, w), bool)
    inner[1:-1, 1:-1] = True
    inner = inner.reshape(-1)
    agree = (np.asarray(idx[0]) == ident)[inner].mean()
    assert agree > 0.97, agree
    # border pixels never converge: iter_proj clamps to [1, w-2] x [1, h-2]
    # exactly like the CUDA kernel (matching_kernels.cu:151-183), so check
    # validity on the interior only (borders dominate a 12x16 toy grid).
    interior = np.zeros((h, w), bool)
    interior[1:-1, 1:-1] = True
    assert np.asarray(valid[0])[interior.reshape(-1), 0].mean() > 0.95


def test_refine_pallas_under_mesh_matches_single_device():
    """The Pallas refine kernels under a dp-sharded batch (shard_map over
    the 8-virtual-device CPU mesh, interpret mode) must equal the
    single-device result — the backend runs the matcher on dp-sharded
    decode outputs, and a shard_map layout interaction in the kernel would
    otherwise ship undetected (VERDICT r3 weak #4)."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.8
        _no_rep_check = {"check_vma": False}
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
        _no_rep_check = {"check_rep": False}

    from frodo_slam_tpu.ops.refine_fused_pallas import refine_matches_fused

    rng = np.random.default_rng(11)
    b, h, w, f = 8, 16, 32, 24
    D11 = rng.normal(size=(b, h, w, f)).astype(np.float32)
    D11 /= np.linalg.norm(D11, axis=-1, keepdims=True)
    D21 = rng.normal(size=(b, h * w, f)).astype(np.float32)
    D21 /= np.linalg.norm(D21, axis=-1, keepdims=True)
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    p = np.stack([uu.ravel(), vv.ravel()], -1)[None].repeat(b, 0)
    p = np.clip(p + rng.integers(-2, 3, p.shape), 0, [w - 1, h - 1]).astype(np.int32)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    spec = P("dp")

    for name, fn in (("fused", refine_matches_fused),):
        def kern(D11, D21, p, fn=fn):
            return fn(D11, D21, p, radius=2, dilation_max=3, interpret=True)

        ps, ss = kern(jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p))
        # no-replication-check: pallas_call out_shapes carry no vma
        # annotation (same setting as the library's shard_map BA reduction)
        sharded = shard_map(
            kern, mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=(spec, spec), **_no_rep_check,
        )
        pm, sm = sharded(jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p))
        np.testing.assert_array_equal(np.asarray(pm), np.asarray(ps), err_msg=name)
        np.testing.assert_allclose(
            np.asarray(sm), np.asarray(ss), atol=1e-5, err_msg=name)


def test_match_end_to_end_fused_agrees_with_shift():
    """Full matcher (iter_proj + occlusion gate + refine) with
    refine_impl='fused' vs the shift default on a consistent scene — the
    pipeline-level check that the fused pyramid's collision semantics do
    not degrade real (near-injective, peaked-landscape) flows.

    The shape must be Mosaic-legal (h%8==0, w%128==0) or match() silently
    rewrites refine_impl='fused' to 'shift' (the small-shape guard) and the
    test compares shift against itself (ADVICE r4)."""
    h, w = 16, 128
    X = make_scene(h, w, 7)
    rng = np.random.default_rng(8)
    D = rng.normal(size=(h, w, 8)).astype(np.float32)
    D /= np.linalg.norm(D, axis=-1, keepdims=True)
    args = (
        jnp.asarray(X)[None], jnp.asarray(X)[None],
        jnp.asarray(D)[None], jnp.asarray(D)[None],
    )
    kw = dict(radius=2, dilation_max=3, dist_thresh=0.5,
              ft_matching_threshold=0.8)
    idx_s, valid_s = matching.match(*args, refine_impl="shift", **kw)
    idx_f, valid_f = matching.match(*args, refine_impl="fused", **kw)
    agree = (np.asarray(idx_s) == np.asarray(idx_f)).mean()
    assert agree > 0.97, agree
    assert abs(np.asarray(valid_f).mean() - np.asarray(valid_s).mean()) < 0.02


def test_split_match_cfg_warm_reach():
    cold, warm = matching.split_match_cfg(
        {"dilation_max": 5, "dilation_max_warm": 2, "max_iter": 10,
         "max_iter_warm": 4, "radius": 3}
    )
    assert cold == {"dilation_max": 5, "max_iter": 10, "radius": 3}
    assert warm == {"dilation_max": 2, "max_iter": 4, "radius": 3}
    # 0 / absent disables the split
    for cfg in ({"dilation_max": 5, "dilation_max_warm": 0, "max_iter_warm": 0},
                {"dilation_max": 5}):
        cold, warm = matching.split_match_cfg(cfg)
        assert cold == warm == {"dilation_max": 5}


def _shifted_match_world(h=16, w=32, shift=2, seed=11):
    """Smooth rolled surface with unique unit descriptors + the ground-truth
    warm start (last frame's converged matches): matcher args for the
    warm-schedule equivalence tests (__graft_entry__._oracle_match_world is
    the batched/interior-masked variant of the same construction)."""
    rng = np.random.default_rng(seed)
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    x = (uu - w / 2) / 8.0
    y = (vv - h / 2) / 8.0
    z = 5.0 + 0.3 * np.sin(uu * 0.2) + 0.2 * np.cos(vv * 0.3)
    X11 = np.stack([x, y, z], -1)[None]
    X21 = np.roll(X11, -shift, axis=2)
    D11 = rng.normal(size=(1, h, w, 24)).astype(np.float32)
    D11 /= np.linalg.norm(D11, axis=-1, keepdims=True)
    D21 = np.roll(D11, -shift, axis=2)
    idx_true = (vv.astype(np.int64) * w + np.minimum(uu + shift, w - 1)).reshape(1, -1)
    return (jnp.asarray(X11, jnp.float32), jnp.asarray(X21, jnp.float32),
            jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(idx_true, jnp.int32))


def test_match_warm_start_small_reach_equivalent():
    """With a converged warm start (the tracking steady state), the
    warm-reach matcher (dilation_max=2) finds the same correspondences as
    the full cold pyramid (dilation_max=5) — the basis for the
    matching.dilation_max_warm default."""
    args = _shifted_match_world()
    kw = dict(max_iter=6, radius=3, ft_matching_threshold=0.8, refine_impl="shift")
    idx_cold, valid_cold = matching.match(*args, dilation_max=5, **kw)
    idx_warm, valid_warm = matching.match(*args, dilation_max=2, **kw)
    vc = np.asarray(valid_cold[..., 0])
    vw = np.asarray(valid_warm[..., 0])
    both = vc & vw
    assert both.mean() > 0.7
    np.testing.assert_array_equal(np.asarray(idx_cold)[both], np.asarray(idx_warm)[both])
    assert vw.mean() >= vc.mean() - 0.02


def test_split_match_cfg_warm_score_only():
    """dilation_max_warm: -1 -> warm frames run the score-only refine
    (dilation_max=0: no window search, the center descriptor probe alone
    gates validity)."""
    cold, warm = matching.split_match_cfg(
        {"dilation_max": 5, "dilation_max_warm": -1, "radius": 3}
    )
    assert cold == {"dilation_max": 5, "radius": 3}
    assert warm == {"dilation_max": 0, "radius": 3}


def test_match_warm_start_score_only_equivalent():
    """With a converged warm start, the score-only matcher (dilation_max=0)
    keeps the cold pyramid's correspondences: the LM projector lands on the
    right pixel and the refine stage only confirms it. Basis for the
    dilation_max_warm: -1 fast path."""
    args = _shifted_match_world()
    kw = dict(max_iter=6, radius=3, ft_matching_threshold=0.8, refine_impl="shift")
    idx_cold, valid_cold = matching.match(*args, dilation_max=5, **kw)
    idx_s, valid_s = matching.match(*args, dilation_max=0, **kw)
    vc = np.asarray(valid_cold[..., 0])
    vs = np.asarray(valid_s[..., 0])
    both = vc & vs
    assert both.mean() > 0.7
    np.testing.assert_array_equal(np.asarray(idx_cold)[both], np.asarray(idx_s)[both])
    # score-only never widens validity beyond the cold result's centers
    assert vs.mean() >= vc.mean() - 0.02


def test_invert_match_roundtrip():
    """backend._invert_match: a valid near-bijective match inverts exactly;
    unmatched target pixels seed at identity."""
    from frodo_slam_tpu.slam.backend import _invert_match

    hw = 16
    # forward map: p -> (p + 3) % hw, valid everywhere except p=5
    idx = (np.arange(hw, dtype=np.int32) + 3) % hw
    valid = np.ones((1, hw, 1), bool)
    valid[0, 5, 0] = False
    inv_j, seeded_j = _invert_match(jnp.asarray(idx[None]), jnp.asarray(valid))
    inv, seeded = np.asarray(inv_j)[0], np.asarray(seeded_j)[0]
    for q in range(hw):
        p = (q - 3) % hw
        if p == 5:
            assert inv[q] == q and not seeded[q]  # hole: identity, unmasked
        else:
            assert inv[q] == p and seeded[q]


def test_match_split_equals_monolithic():
    """match_split (the production 3-dispatch matcher) must be bit-identical
    to the monolithic match program — same ops, only program boundaries
    differ (the in-situ LM blowup fix, PERF.md round 5)."""
    h, w = 16, 32
    X = make_scene(h, w, 5)
    rng = np.random.default_rng(4)
    D = rng.normal(size=(h, w, 8)).astype(np.float32)
    D /= np.linalg.norm(D, axis=-1, keepdims=True)
    args = (
        jnp.asarray(X)[None], jnp.asarray(X)[None],
        jnp.asarray(D)[None], jnp.asarray(D)[None],
    )
    for kw in (
        dict(radius=2, dilation_max=3, refine_impl="shift"),
        dict(radius=2, dilation_max=0),  # score-only warm path
        dict(radius=0, dilation_max=0),  # no refine at all
    ):
        idx_m, valid_m = matching.match(*args, **kw)
        idx_s, valid_s = matching.match_split(*args, **kw)
        np.testing.assert_array_equal(np.asarray(idx_m), np.asarray(idx_s))
        np.testing.assert_array_equal(np.asarray(valid_m), np.asarray(valid_s))
    # warm-seeded variant
    idx0 = jnp.broadcast_to(jnp.arange(h * w, dtype=jnp.int32)[None], (1, h * w))
    a = matching.match(*args, idx0, max_iter=4, dilation_max=0)
    b = matching.match_split(*args, idx0, max_iter=4, dilation_max=0)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
