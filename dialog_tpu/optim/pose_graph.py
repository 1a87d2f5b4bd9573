"""Sim3 essential-graph optimization (loop-closure correction).

Replaces ``Optimizer::OptimizeEssentialGraph`` + g2o's Sim3 vertex/edge
types (canonical ``src/Optimizer.cc``, ``types_seven_dof_expmap.h`` —
SURVEY.md §2.1/§2.2). Nodes are per-keyframe Sim3 world->camera transforms;
edges are the spanning tree, strong covisibility pairs, and loop edges with
relative-Sim3 measurements. The solve is damped Gauss-Newton where the
per-edge 7x7 Jacobian blocks come from `jax.jacfwd` of the residual at zero
perturbation (the pose graph runs once per loop closure — robustness over
hand-derived Jacobians), assembled into a dense [7K, 7K] system; K is a few
hundred, so the dense solve is tiny for the MXU.

Landmark correction afterwards follows the reference: each landmark moves
with its reference keyframe's correction S_new^-1 o S_old.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import geometry as geo
from ..config import EngineConfig
from ..containers import MapState


class PoseGraphProblem(NamedTuple):
    # nodes (all keyframe slots; invalid ones frozen)
    s: jax.Array        # f32[K]
    R: jax.Array        # f32[K, 3, 3]
    t: jax.Array        # f32[K, 3]
    opt: jax.Array      # bool[K] optimize this node
    # edges with relative measurements S_ij = S_i o S_j^-1
    e_i: jax.Array      # i32[E]
    e_j: jax.Array      # i32[E]
    m_s: jax.Array      # f32[E]
    m_R: jax.Array      # f32[E, 3, 3]
    m_t: jax.Array      # f32[E, 3]
    e_ok: jax.Array     # bool[E]
    e_w: jax.Array      # f32[E] edge weight


def build_pose_graph(
    m: MapState,
    cfg: EngineConfig,
    loop_i: jax.Array,
    loop_j: jax.Array,
    loop_s: jax.Array,
    loop_R: jax.Array,
    loop_t: jax.Array,
    fixed_kf: jax.Array,
    corrected_s: jax.Array | None = None,
) -> PoseGraphProblem:
    """Essential graph: spanning tree + covis(w >= th) + the loop edge.

    Measurements are the *current* relative poses (scale 1) for tree/covis
    edges — they encode the odometry to preserve — and the computed Sim3 for
    the loop edge. ``corrected_s`` optionally seeds node scales (for KFs
    already corrected by propagation).
    """
    K = m.kfs.valid.shape[0]
    s0 = jnp.ones((K,)) if corrected_s is None else corrected_s
    R0, t0 = m.kfs.R, m.kfs.t

    # --- edge list (fixed capacity: K tree edges + E_cov covis + 1 loop) --
    parent = m.kfs.parent
    tree_ok = m.kfs.valid & (parent >= 0)
    tree_i = jnp.arange(K, dtype=jnp.int32)
    tree_j = jnp.clip(parent, 0, K - 1)

    covis = jnp.where(
        m.kfs.valid[:, None] & m.kfs.valid[None, :], m.covis, 0
    )
    covis = jnp.triu(covis, 1)
    strong = covis >= cfg.essential_covis_th
    flat = strong.reshape(-1)
    E_cov = K * 4  # capacity for strong covis edges
    cov_idx, = jnp.nonzero(flat, size=E_cov, fill_value=0)
    cov_ok = jnp.arange(E_cov) < jnp.sum(flat.astype(jnp.int32))
    cov_i = (cov_idx // K).astype(jnp.int32)
    cov_j = (cov_idx % K).astype(jnp.int32)

    e_i = jnp.concatenate([tree_i, cov_i, loop_i[None].astype(jnp.int32)])
    e_j = jnp.concatenate([tree_j, cov_j, loop_j[None].astype(jnp.int32)])
    e_ok = jnp.concatenate([tree_ok, cov_ok, jnp.ones((1,), bool)])
    e_w = jnp.concatenate(
        [jnp.full((K,), 1.0), jnp.full((E_cov,), 1.0), jnp.full((1,), 5.0)]
    )

    # relative measurements from current poses: S_ij = S_i o S_j^-1 (scale 1)
    Ri, ti = R0[e_i], t0[e_i]
    Rj, tj = R0[e_j], t0[e_j]
    sj_inv, Rj_inv, tj_inv = geo.sim3_inv(jnp.ones(e_j.shape[0]), Rj, tj)
    m_s, m_R, m_t = geo.sim3_compose(
        jnp.ones(e_i.shape[0]), Ri, ti, sj_inv, Rj_inv, tj_inv
    )
    # loop edge measurement: the computed Sim3 (cur <- cand)
    E = e_i.shape[0]
    m_s = m_s.at[E - 1].set(loop_s)
    m_R = m_R.at[E - 1].set(loop_R)
    m_t = m_t.at[E - 1].set(loop_t)

    opt = m.kfs.valid & (jnp.arange(K) != fixed_kf)
    return PoseGraphProblem(
        s=s0, R=R0, t=t0, opt=opt,
        e_i=e_i, e_j=e_j, m_s=m_s, m_R=m_R, m_t=m_t, e_ok=e_ok, e_w=e_w,
    )


def _edge_residual(xi_i, xi_j, si, Ri, ti, sj, Rj, tj, ms, mR, mt):
    """r = log( S_ij_meas^-1 o (exp(xi_i) S_i) o (exp(xi_j) S_j)^-1 )."""
    si2, Ri2, ti2 = geo.sim3_retract(si, Ri, ti, xi_i)
    sj2, Rj2, tj2 = geo.sim3_retract(sj, Rj, tj, xi_j)
    sji, Rji, tji = geo.sim3_inv(sj2, Rj2, tj2)
    s_ij, R_ij, t_ij = geo.sim3_compose(si2, Ri2, ti2, sji, Rji, tji)
    msi, mRi, mti = geo.sim3_inv(ms, mR, mt)
    s_e, R_e, t_e = geo.sim3_compose(msi, mRi, mti, s_ij, R_ij, t_ij)
    return geo.sim3_log(s_e, R_e, t_e)


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_pose_graph(prob: PoseGraphProblem, iters: int = 20, lam0: float = 1e-4):
    """Damped GN over the Sim3 graph. Returns (s, R, t) per node."""
    K = prob.s.shape[0]
    E = prob.e_i.shape[0]
    zero7 = jnp.zeros((7,))

    res_and_jac = jax.vmap(
        lambda si, Ri, ti, sj, Rj, tj, ms, mR, mt: (
            _edge_residual(zero7, zero7, si, Ri, ti, sj, Rj, tj, ms, mR, mt),
            jax.jacfwd(
                lambda x: _edge_residual(
                    x, zero7, si, Ri, ti, sj, Rj, tj, ms, mR, mt
                )
            )(zero7),
            jax.jacfwd(
                lambda x: _edge_residual(
                    zero7, x, si, Ri, ti, sj, Rj, tj, ms, mR, mt
                )
            )(zero7),
        )
    )

    opt7 = jnp.repeat(prob.opt, 7)

    def system(s, R, t):
        si, Ri, ti = s[prob.e_i], R[prob.e_i], t[prob.e_i]
        sj, Rj, tj = s[prob.e_j], R[prob.e_j], t[prob.e_j]
        r, Ji, Jj = res_and_jac(
            si, Ri, ti, sj, Rj, tj, prob.m_s, prob.m_R, prob.m_t
        )
        w = jnp.where(prob.e_ok, prob.e_w, 0.0)
        cost = jnp.sum(w * jnp.sum(r * r, -1))
        # assemble H [K,7,K,7], g [K,7]
        Hii = jnp.einsum("eai,e,eaj->eij", Ji, w, Ji)
        Hjj = jnp.einsum("eai,e,eaj->eij", Jj, w, Jj)
        Hij = jnp.einsum("eai,e,eaj->eij", Ji, w, Jj)
        gi = jnp.einsum("eai,e,ea->ei", Ji, w, r)
        gj = jnp.einsum("eai,e,ea->ei", Jj, w, r)
        Kp = K + 1
        i_ = jnp.where(prob.e_ok, prob.e_i, K)
        j_ = jnp.where(prob.e_ok, prob.e_j, K)
        Hbig = jnp.zeros((Kp * Kp, 7, 7))
        Hbig = Hbig.at[i_ * Kp + i_].add(Hii)
        Hbig = Hbig.at[j_ * Kp + j_].add(Hjj)
        Hbig = Hbig.at[i_ * Kp + j_].add(Hij)
        Hbig = Hbig.at[j_ * Kp + i_].add(jnp.swapaxes(Hij, -1, -2))
        H = Hbig.reshape(Kp, Kp, 7, 7)[:K, :K]
        g = jnp.zeros((Kp, 7)).at[i_].add(gi).at[j_].add(gj)[:K]
        H = jnp.transpose(H, (0, 2, 1, 3)).reshape(7 * K, 7 * K)
        return cost, H, g.reshape(-1)

    def step(carry):
        s, R, t, lam, cost = carry
        _, H, g = system(s, R, t)
        dH = jnp.diagonal(H)
        Hd = H + jnp.diag(lam * jnp.maximum(dH, 1e-9) + 1e-9)
        Hd = jnp.where(opt7[:, None] & opt7[None, :], Hd, 0.0)
        Hd = Hd + jnp.diag(jnp.where(opt7, 0.0, 1.0))
        rhs = jnp.where(opt7, -g, 0.0)
        dx = jnp.linalg.solve(Hd, rhs).reshape(K, 7)
        s2, R2, t2 = geo.sim3_retract(s, R, t, dx)
        R2 = geo.orthogonalize(R2)
        new_cost, _, _ = system(s2, R2, t2)
        accept = new_cost < cost
        s = jnp.where(accept, s2, s)
        R = jnp.where(accept, R2, R)
        t = jnp.where(accept, t2, t)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        cost = jnp.where(accept, new_cost, cost)
        return s, R, t, lam, cost

    cost0, _, _ = system(prob.s, prob.R, prob.t)
    s, R, t, _, cost = jax.lax.fori_loop(
        0, iters, lambda _, c: step(c),
        (prob.s, prob.R, prob.t, jnp.float32(lam0), cost0),
    )
    return s, R, t, cost


@functools.partial(jax.jit, static_argnames=("cfg",))
def apply_pose_graph_correction(
    m: MapState,
    s_new: jax.Array,
    R_new: jax.Array,
    t_new: jax.Array,
    cfg: EngineConfig,
) -> MapState:
    """Write corrected poses and move landmarks with their reference KF.

    Keyframe SE3 = [R | t/s] (reference: OptimizeEssentialGraph recovering
    Tiw from the optimized Siw); landmark X' = S_new^-1(S_old(X)) using its
    reference keyframe's old/new transforms.
    """
    K = m.kfs.valid.shape[0]
    L = m.lms.xyz.shape[0]
    R_old, t_old = m.kfs.R, m.kfs.t

    kfs = m.kfs._replace(
        R=jnp.where(m.kfs.valid[:, None, None], R_new, R_old),
        t=jnp.where(m.kfs.valid[:, None], t_new / s_new[:, None], t_old),
    )
    ref = jnp.clip(m.lms.ref_kf, 0, K - 1)
    ok = m.lms.valid & (m.lms.ref_kf >= 0)
    # X_cam = S_old_ref(X_w);  X_w' = S_new_ref^-1(X_cam)
    Xc = geo.sim3_apply(
        jnp.ones((L,)), R_old[ref], t_old[ref], m.lms.xyz
    )
    si, Ri, ti = geo.sim3_inv(s_new[ref], R_new[ref], t_new[ref])
    Xw = geo.sim3_apply(si, Ri, ti, Xc)
    lms = m.lms._replace(xyz=jnp.where(ok[:, None], Xw, m.lms.xyz))
    return m._replace(kfs=kfs, lms=lms)
