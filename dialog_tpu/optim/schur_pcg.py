"""Matrix-free Schur-complement PCG for large bundle adjustment.

The dense reduced camera system ``S = Hcc - Y Hll^-1 Y^T`` that
``local_ba.solve_ba`` forms explicitly is O((6C)^2) memory and needs
O((6C)^2 · 3P) flops to build via the one-hot contraction — fine for
covisibility windows (C <= 64), ruinous at global scale (the KITTI00
preset: C = 2048 cameras, P = 262k landmarks would be hundreds of
teraflops PER LM ITERATION). This solver never forms S: each CG iteration
applies it from the per-observation factors

    S x = Hcc_d x - sum_p Y_p (Hll_p^-1 (Y_p^T x_{cams(p)}))

at O(P·O) cost, with a block-Jacobi preconditioner built from S's exact
6x6 diagonal blocks (a landmark is observed at most once per camera, so
the pair term's diagonal is a plain segment-sum of (Y Lh)(Y Lh)^T — no
cross terms).

This is how large-scale BA systems make Schur tractable (canonical
g2o/Ceres analogue: iterative Schur with the SCHUR_JACOBI preconditioner;
reference: ``Optimizer::GlobalBundleAdjustemnt`` + g2o BlockSolver_6_3,
SURVEY.md §2.1/§2.2). Every piece is a batched contraction, gather, or
segment-sum over the landmark axis, so the identical code path shards over
the device mesh (optim/global_ba.shard_problem): per-shard landmark
contributions combine into the replicated [C, 6] camera vectors through
XLA-inserted all-reduces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import geometry as geo
from ..config import EngineConfig
from .lm import all_finite, chol3x3, tri_inv3x3_lower
from .local_ba import (
    BAProblem,
    _delta2_of,
    _residuals,
    _robust_weights,
    _use_stereo,
)


def _lm_machinery(
    prob: BAProblem,
    cfg: EngineConfig,
    chi2_th,
    cg_iters: int,
    cg_tol: float = 1e-6,
    chunk: bool = True,
):
    """Build (cost_of, body) closures for the PCG LM iteration.

    Shared by the one-shot ``solve_ba_pcg`` and the chunked
    ``lm_steps_pcg`` (async loop-closure GBA runs one LM iteration per
    tracked batch — VERDICT r4 directive 3). The LM carry is
    ``(R, t, xyz, lam, cost, cg_total)``; ``cg_total`` counts CG iterations
    actually executed (== cross-shard all-reduces on a sharded problem)."""
    fx, fy, cx, cy = cfg.fx, cfg.fy, cfg.cx, cfg.cy
    C = prob.cam_slots.shape[0]
    P = prob.lm_ids.shape[0]
    bf = cfg.bf if _use_stereo(prob, cfg) else 0.0
    delta2 = _delta2_of(prob, cfg, chi2_th)
    eye6 = jnp.eye(6, dtype=jnp.float32)

    def cost_of(R, t, xyz):
        r, _, _, ok = _residuals(prob, R, t, xyz, fx, fy, cx, cy, bf)
        _, cost, _ = _robust_weights(r, prob.obs_w, ok, delta2)
        # cheirality penalty — see local_ba.solve_ba's cost_of
        n_behind = jnp.sum((prob.obs_ok & ~ok).astype(jnp.float32))
        return cost + 1e3 * n_behind

    def seg6(cam, vals):
        """Segment-sum [P,O,...] observation values into [C] camera rows."""
        flat = cam.reshape(-1)
        v = vals.reshape((flat.shape[0],) + vals.shape[2:])
        out = jnp.zeros((C + 1,) + vals.shape[2:], vals.dtype)
        return out.at[flat].add(v, mode="drop")[:C]

    O = prob.obs_cam.shape[1]
    # landmark-slab chunking for the construction phase: at KITTI00 global
    # capacity (P = 262k, O = 12) the unchunked einsums materialize several
    # [P, O, 6, 6]-class temporaries at once — measured 19.7 GB of HBM, an
    # OOM on a 16 GB chip. Slabs bound the transient footprint; only the
    # back-substitution factors (Y [P,O,6,3], Hll_inv, g_l) stay resident.
    # chunking and mesh sharding are mutually exclusive: reshaping the
    # sharded landmark axis to [n_ch, Pc] forces a GSPMD reshard per slab
    # (and sharding already divides the transient footprint by the device
    # count) — sharded callers pass chunk=False
    Pc = P
    while Pc > 16384 and Pc % 2 == 0:
        Pc //= 2
    n_ch = P // Pc if (chunk and P > 65536) else 1
    if n_ch == 1:
        Pc = P

    def slab_terms(cam_s, uv_s, w_s, ok_s, ur_s, xyz_s, d2_s, lo_s, R, t, lam):
        """One landmark slab: per-slab factors + camera-side accumulators."""
        sp = prob._replace(
            obs_cam=cam_s, obs_uv=uv_s, obs_w=w_s, obs_ok=ok_s,
            obs_ur=ur_s, xyz=xyz_s, lm_opt=lo_s,
        )
        r, J_c, J_l, ok = _residuals(sp, R, t, xyz_s, fx, fy, cx, cy, bf)
        w, cost, _ = _robust_weights(r, w_s, ok, d2_s)
        opt_of_obs = prob.cam_opt[jnp.clip(cam_s, 0, C - 1)]
        J_c = jnp.where(opt_of_obs[..., None, None], J_c, 0.0)
        if sp.lm_opt is not None:
            J_l = jnp.where(sp.lm_opt[:, None, None, None], J_l, 0.0)
        cam = jnp.clip(cam_s, 0, C)                 # C = pad row (sliced off)

        # --- landmark blocks (identical math to solve_ba) ----------------
        Hll = jnp.einsum("poki,po,pokj->pij", J_l, w, J_l)
        g_l = jnp.einsum("poki,po,pok->pi", J_l, w, r)
        dll = jnp.diagonal(Hll, axis1=-2, axis2=-1)
        Hll_d = Hll + (lam * jnp.maximum(dll, 1e-9) + 1e-9)[..., None] * jnp.eye(
            3, dtype=Hll.dtype
        )
        Ld = chol3x3(Hll_d)
        Ld_inv = tri_inv3x3_lower(Ld)
        Hll_inv = jnp.einsum("pki,pkj->pij", Ld_inv, Ld_inv)

        # --- per-observation camera factors ------------------------------
        Y = jnp.einsum("poki,po,pokj->poij", J_c, w, J_l)        # [Pc,O,6,3]
        g_c = seg6(cam, jnp.einsum("poki,po,pok->poi", J_c, w, r))
        Hcc = seg6(cam, jnp.einsum("poki,po,pokj->poij", J_c, w, J_c))
        g_red = seg6(
            cam,
            jnp.einsum("poij,pj->poi", Y, jnp.einsum("pij,pj->pi", Hll_inv, g_l)),
        )
        Lh = jnp.swapaxes(Ld_inv, -1, -2)                        # [Pc,3,3]
        YL = jnp.einsum("poij,pjk->poik", Y, Lh)
        Dsub = seg6(cam, jnp.einsum("poik,pojk->poij", YL, YL))
        return cost, Hll_inv, g_l, Y, g_c, Hcc, g_red, Dsub

    def step(R, t, xyz, lam):
        ur = prob.obs_ur
        if n_ch == 1:
            cost, Hll_inv, g_l, Y, g_c, Hcc, g_red, Dsub = slab_terms(
                prob.obs_cam, prob.obs_uv, prob.obs_w, prob.obs_ok,
                ur, xyz, delta2, prob.lm_opt, R, t, lam,
            )
        else:
            def resh(x):
                return x.reshape((n_ch, Pc) + x.shape[1:])

            slabs = (
                resh(prob.obs_cam), resh(prob.obs_uv), resh(prob.obs_w),
                resh(prob.obs_ok),
                resh(ur) if ur is not None else None,
                resh(xyz),
                None if jnp.ndim(delta2) == 0 else resh(delta2),
                resh(prob.lm_opt) if prob.lm_opt is not None else None,
            )

            def body(acc, sl):
                cam_s, uv_s, w_s, ok_s, ur_s, xyz_s, d2_s, lo_s = sl
                out = slab_terms(
                    cam_s, uv_s, w_s, ok_s, ur_s, xyz_s,
                    delta2 if d2_s is None else d2_s, lo_s, R, t, lam,
                )
                cost, hli, gl, y, gc, hcc, gr, ds = out
                a = (acc[0] + cost, acc[1] + gc, acc[2] + hcc,
                     acc[3] + gr, acc[4] + ds)
                return a, (hli, gl, y)

            acc0 = (
                jnp.float32(0.0), jnp.zeros((C, 6)), jnp.zeros((C, 6, 6)),
                jnp.zeros((C, 6)), jnp.zeros((C, 6, 6)),
            )
            (cost, g_c, Hcc, g_red, Dsub), (Hll_inv, g_l, Y) = jax.lax.scan(
                body, acc0, slabs
            )
            Hll_inv = Hll_inv.reshape(P, 3, 3)
            g_l = g_l.reshape(P, 3)
            Y = Y.reshape(P, O, 6, 3)

        cam = jnp.clip(prob.obs_cam, 0, C)
        dcc = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
        Hcc_d = Hcc + (lam * jnp.maximum(dcc, 1e-9) + 1e-9)[..., None] * eye6
        # frozen cameras: identity rows keep the system nonsingular while
        # the zero rhs pins their update to zero
        Hcc_d = jnp.where(prob.cam_opt[:, None, None], Hcc_d, eye6)

        # --- block-Jacobi preconditioner: exact 6x6 diagonal of S --------
        D = Hcc_d - Dsub
        D = jnp.where(prob.cam_opt[:, None, None], D, eye6)
        D_inv = jnp.linalg.inv(D + 1e-8 * eye6)

        opt6 = prob.cam_opt[:, None]                              # [C,1]

        def matvec(x):                                            # x [C,6]
            x = jnp.where(opt6, x, 0.0)
            y = jnp.einsum("cij,cj->ci", Hcc_d, x)
            xp = jnp.concatenate([x, jnp.zeros((1, 6), x.dtype)])
            xg = xp[cam]                                          # [P,O,6]
            u = jnp.einsum("poij,poi->pj", Y, xg)                 # [P,3]
            wv = jnp.einsum("pij,pj->pi", Hll_inv, u)
            y = y - seg6(cam, jnp.einsum("poij,pj->poi", Y, wv))
            return jnp.where(opt6, y, 0.0)

        def precond(x):
            return jnp.where(opt6, jnp.einsum("cij,cj->ci", D_inv, x), 0.0)

        b = jnp.where(opt6, -(g_c - g_red), 0.0)

        # PCG with early exit on the M-norm relative residual: every CG
        # iteration costs exactly ONE cross-shard all-reduce (the [C, 6]
        # camera reduction inside matvec), so stopping at convergence
        # instead of a fixed budget is a direct cut of the sharded solve's
        # collective bill (VERDICT r4 directive 5; roofline in KERNELS.md).
        def cg_body(carry):
            i, x, res, z, p, rz = carry
            Ap = matvec(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) > 1e-20, pAp, 1.0)
            alpha = jnp.where(jnp.abs(pAp) > 1e-20, alpha, 0.0)
            x = x + alpha * p
            res = res - alpha * Ap
            z = precond(res)
            rz_new = jnp.sum(res * z)
            beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1.0)
            beta = jnp.where(jnp.abs(rz) > 1e-20, beta, 0.0)
            p = z + beta * p
            return i + 1, x, res, z, p, rz_new

        x0 = jnp.zeros((C, 6))
        z0 = precond(b)
        rz0 = jnp.sum(b * z0)

        def cg_cond(carry):
            i, _, _, _, _, rz = carry
            return (i < cg_iters) & (rz > cg_tol * rz0)

        n_cg, dc, *_ = jax.lax.while_loop(
            cg_cond, cg_body, (jnp.int32(0), x0, b, z0, z0, rz0)
        )

        # --- landmark back-substitution ----------------------------------
        dcp = jnp.concatenate([dc, jnp.zeros((1, 6))])[cam]       # [P,O,6]
        cross = jnp.einsum("poij,poi->pj", Y, dcp)
        dl = jnp.einsum("pij,pj->pi", Hll_inv, -g_l - cross)

        R_new, t_new = geo.se3_retract(R, t, dc)
        xyz_new = xyz + dl
        return R_new, t_new, xyz_new, cost, n_cg

    def body(_, carry):
        R, t, xyz, lam, cost, cg_total = carry
        R_new, t_new, xyz_new, _, n_cg = step(R, t, xyz, lam)
        new_cost = cost_of(R_new, t_new, xyz_new)
        accept = (new_cost < cost) & all_finite((R_new, t_new, xyz_new))
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        xyz = jnp.where(accept, xyz_new, xyz)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        cost = jnp.where(accept, new_cost, cost)
        return R, t, xyz, lam, cost, cg_total + n_cg

    return cost_of, body


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "iters", "cg_iters", "return_cg_iters", "chunk"),
)
def solve_ba_pcg(
    prob: BAProblem,
    cfg: EngineConfig,
    iters: int = 10,
    chi2_th: float = 5.991,
    lam0: float = 1e-4,
    cg_iters: int = 48,
    cg_tol: float = 1e-6,
    return_cg_iters: bool = False,
    chunk: bool = True,
):
    """Damped LM with a matrix-free Schur PCG camera solve.

    Drop-in alternative to ``local_ba.solve_ba`` for problems whose reduced
    camera system is too large to form densely. Returns
    (R [C,3,3], t [C,3], xyz [P,3], final robust cost)
    (+ total CG iterations when ``return_cg_iters`` — one cross-shard
    all-reduce each on a sharded problem).
    """
    cost_of, body = _lm_machinery(prob, cfg, chi2_th, cg_iters, cg_tol, chunk)
    R_in = geo.orthogonalize(prob.R)
    cost0 = cost_of(R_in, prob.t, prob.xyz)
    R, t, xyz, _, cost, cg_total = jax.lax.fori_loop(
        0, iters, body,
        (R_in, prob.t, prob.xyz, jnp.float32(lam0), cost0, jnp.int32(0)),
    )
    if return_cg_iters:
        return geo.orthogonalize(R), t, xyz, cost, cg_total
    return geo.orthogonalize(R), t, xyz, cost


@functools.partial(jax.jit, static_argnames=("cfg", "cg_iters"))
def lm_init_pcg(
    prob: BAProblem,
    cfg: EngineConfig,
    chi2_th: float = 5.991,
    lam0: float = 1e-4,
    cg_iters: int = 48,
):
    """Initial LM carry (R, t, xyz, lam, cost, cg_total) for chunked solving."""
    cost_of, _ = _lm_machinery(prob, cfg, chi2_th, cg_iters)
    R_in = geo.orthogonalize(prob.R)
    cost0 = cost_of(R_in, prob.t, prob.xyz)
    return R_in, prob.t, prob.xyz, jnp.float32(lam0), cost0, jnp.int32(0)


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_iters", "cg_iters", "chunk")
)
def lm_steps_pcg(
    prob: BAProblem,
    cfg: EngineConfig,
    carry,
    chi2_th: float = 5.991,
    n_iters: int = 1,
    cg_iters: int = 48,
    cg_tol: float = 1e-6,
    chunk: bool = True,
):
    """Advance the LM carry by ``n_iters`` iterations (identical math to
    ``solve_ba_pcg`` — one chunk of the asynchronously-overlapped GBA).

    The async GBA bounds its per-frame stall by truncating CG
    (``cg_iters``) and loosening ``cg_tol`` — inexact-Newton LM: a coarser
    camera solve per iteration, still guarded by the accept/reject rule."""
    _, body = _lm_machinery(prob, cfg, chi2_th, cg_iters, cg_tol, chunk)
    return jax.lax.fori_loop(0, n_iters, body, carry)
