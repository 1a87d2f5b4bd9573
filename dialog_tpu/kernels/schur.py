"""Fused BA Jacobian-accumulation + Schur-reduction kernel (Pallas TPU).

The inner loop of ``optim/local_ba.solve_ba`` builds, per LM iteration,
per-observation tensors ([P,O,2,6] pose Jacobians, [P,O,6,6] camera blocks,
[P,O,6,3] cross terms, a [P,C+1,6,3] one-hot scatter tensor) in HBM and
reduces them with a chain of ~30 einsums — at covisibility-window sizes the
step is op-count/HBM-traffic bound, not FLOP bound. This kernel computes
the whole reduction in one pass with everything VMEM-resident:

  residuals -> analytic Jacobians -> Huber weights -> landmark 3x3 blocks
  (damped Cholesky inverse) -> camera gradient/Hessian blocks -> the Schur
  pair term S_pair = sum_p Y_p Hll_p^-1 Y_p^T as one MXU matmul per tile.

Only the small camera-side systems ([C,6,6], [C,6], [6C,6C]) and the
per-landmark back-substitution inputs (Hll^-1, g_l, Y) ever reach HBM.

Layout notes (the whole trick):
* per-observation quantities are kept as [1, O*TP] lane-major "planes"
  (TP landmarks per tile, observation-major flattening m = o*TP + p), so
  every algebraic step is a full-lane VPU op instead of a [*, 2, 6]
  micro-tensor contraction;
* per-observation camera parameters come from one one-hot matmul
  CP = camtab @ E^T — the gather that TPUs don't do becomes an MXU product;
* the camera-side scatters are the transposed one-hot products
  dot(E, planes^T), and the pair term stacks (Y L_h) slabs into a
  [6*C1, 3*TP] matrix Z so that S_pair accumulates as dot(Z, Z^T).

These are the two remaining BASELINE.json-named Pallas targets ("Jacobian
accumulation", "Schur-complement reduction"); the canonical reference is
``src/Optimizer.cc`` + g2o's BlockSolver_6_3 (SURVEY.md §2.1/§2.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_mode, use_pallas

TP = 128          # landmarks per grid step
MAX_CAMS = 136    # C+1 above this: VMEM-budget bound, fall back to jnp path


def _kernel(fx, fy, cx, cy, O, C1, use_stereo,
            params_ref, camtab_ref, cam_ref, u_ref, v_ref, w_ref, *rest):
    # the uR observation plane exists only for stereo problems: a mono
    # problem never streams (or DMAs) a dead [1, O*TP] plane per grid step
    if use_stereo:
        (ur_ref, x_ref, y_ref, z_ref,
         hllinv_ref, gl_ref, yout_ref, hcc_ref, gc_ref, gred_ref, s_ref,
         z2_scr) = rest
    else:
        (x_ref, y_ref, z_ref,
         hllinv_ref, gl_ref, yout_ref, hcc_ref, gc_ref, gred_ref, s_ref,
         z2_scr) = rest
        ur_ref = None
    i = pl.program_id(0)
    lam = params_ref[0, 0]
    delta2 = params_ref[0, 1]
    bf = params_ref[0, 2]
    delta2_st = params_ref[0, 3]
    OTP = O * TP

    # one-hot camera membership: ET[c, m] = (obs_cam[m] == c)
    cam = cam_ref[0]                                     # [1, OTP] i32
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (C1, OTP), 0)
    ET = (iota_c == cam).astype(jnp.float32)             # [C1, OTP]
    # per-observation camera parameters: [16, OTP] (rows: R(9), t(3), opt)
    CP = jnp.dot(camtab_ref[...], ET, preferred_element_type=jnp.float32)

    def cp(k):
        return CP[k : k + 1, :]                          # [1, OTP]

    r00, r01, r02 = cp(0), cp(1), cp(2)
    r10, r11, r12 = cp(3), cp(4), cp(5)
    r20, r21, r22 = cp(6), cp(7), cp(8)
    t0, t1, t2, opt = cp(9), cp(10), cp(11), cp(12)

    # landmark coords, broadcast per observation (m = o*TP + p)
    xw = jnp.tile(x_ref[0], (1, O))
    yw = jnp.tile(y_ref[0], (1, O))
    zw = jnp.tile(z_ref[0], (1, O))

    xc = r00 * xw + r01 * yw + r02 * zw + t0
    yc = r10 * xw + r11 * yw + r12 * zw + t1
    zc = r20 * xw + r21 * yw + r22 * zw + t2
    zs = jnp.where(jnp.abs(zc) < 1e-9, 1e-9, zc)
    iz = 1.0 / zs
    iz2 = iz * iz

    u_obs = u_ref[0]
    v_obs = v_ref[0]
    w_info = w_ref[0]
    rx = fx * xc * iz + cx - u_obs
    ry = fy * yc * iz + cy - v_obs
    ok = (w_info > 0.0) & (zc > 1e-3)
    if use_stereo:
        # third residual row uR_hat - uR for observations carrying a stereo
        # right-x (ur >= 0); mono rows masked (reference: g2o's mixed
        # EdgeSE3ProjectXYZ / EdgeStereoSE3ProjectXYZ graphs)
        ur_obs = ur_ref[0]
        has = (ur_obs >= 0.0).astype(jnp.float32)
        rw = (fx * xc * iz + cx - bf * iz - ur_obs) * has
        chi2 = (rx * rx + ry * ry + rw * rw) * w_info
        d2 = jnp.where(has > 0.0, delta2_st, delta2)
    else:
        chi2 = (rx * rx + ry * ry) * w_info
        d2 = delta2
    w_rob = jnp.where(
        chi2 <= d2, 1.0, jnp.sqrt(d2 / jnp.maximum(chi2, 1e-12))
    )
    w = jnp.where(ok, w_info * w_rob, 0.0)               # [1, OTP]

    # analytic Jacobians (geo.project_jacobians closed forms), as planes
    a = fx * iz
    c_ = -fx * xc * iz2
    b = fy * iz
    d_ = -fy * yc * iz2
    zero = jnp.zeros_like(a)
    Ju = [a, zero, c_,
          -fx * xc * yc * iz2, fx * (1.0 + xc * xc * iz2), -fx * yc * iz]
    Jv = [zero, b, d_,
          -fy * (1.0 + yc * yc * iz2), fy * xc * yc * iz2, fy * xc * iz]
    Ju = [j * opt for j in Ju]                            # freeze fixed cams
    Jv = [j * opt for j in Jv]
    R_rows = [(r00, r10, r20), (r01, r11, r21), (r02, r12, r22)]
    Jlu = [a * Rj[0] + c_ * Rj[2] for Rj in R_rows]
    Jlv = [b * Rj[1] + d_ * Rj[2] for Rj in R_rows]
    if use_stereo:
        # uR row: d(uR)/dXc = [fx/z, 0, (-fx*x + bf)/z^2] — the u row with
        # its z-derivative shifted by bf/z^2 (geo.stereo_project_jacobians)
        c2 = c_ + bf * iz2
        Jw = [a, zero, c2, c2 * yc, a * zc - c2 * xc, -a * yc]
        Jw = [j * opt * has for j in Jw]
        Jlw = [(a * Rj[0] + c2 * Rj[2]) * has for Rj in R_rows]

    def lsum(p):
        """Sum an [1, O*TP] per-obs plane over observations -> [1, TP].

        Reshape-to-sublanes then reduce: Mosaic rejects lane-offset slices
        of [1, N] vectors in downstream broadcasts, and the sublane
        reduction is a single VPU op anyway.
        """
        return jnp.sum(p.reshape(O, TP), axis=0, keepdims=True)

    # --- landmark 3x3 blocks + gradient -------------------------------
    Hll = {}
    for aa in range(3):
        for bb in range(aa, 3):
            acc = Jlu[aa] * Jlu[bb] + Jlv[aa] * Jlv[bb]
            if use_stereo:
                acc = acc + Jlw[aa] * Jlw[bb]
            Hll[(aa, bb)] = lsum(w * acc)
    if use_stereo:
        gl = [
            lsum(w * (Jlu[k] * rx + Jlv[k] * ry + Jlw[k] * rw))
            for k in range(3)
        ]
    else:
        gl = [lsum(w * (Jlu[k] * rx + Jlv[k] * ry)) for k in range(3)]

    dmp = lambda h: h + lam * jnp.maximum(h, 1e-9) + 1e-9
    H00, H11, H22 = dmp(Hll[(0, 0)]), dmp(Hll[(1, 1)]), dmp(Hll[(2, 2)])
    H01, H02, H12 = Hll[(0, 1)], Hll[(0, 2)], Hll[(1, 2)]
    # Cholesky of the damped block + closed-form lower-triangular inverse
    l11 = jnp.sqrt(jnp.maximum(H00, 1e-18))
    l21 = H01 / l11
    l31 = H02 / l11
    l22 = jnp.sqrt(jnp.maximum(H11 - l21 * l21, 1e-18))
    l32 = (H12 - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(H22 - l31 * l31 - l32 * l32, 1e-18))
    i11 = 1.0 / l11
    i22 = 1.0 / l22
    i33 = 1.0 / l33
    i21 = -l21 * i11 * i22
    i31 = (l21 * l32 - l31 * l22) * i11 * i22 * i33
    i32 = -l32 * i22 * i33
    Li = [[i11, None, None], [i21, i22, None], [i31, i32, i33]]
    # Hll_inv = Li^T Li (symmetric)
    inv = {
        (0, 0): i11 * i11 + i21 * i21 + i31 * i31,
        (0, 1): i21 * i22 + i31 * i32,
        (0, 2): i31 * i33,
        (1, 1): i22 * i22 + i32 * i32,
        (1, 2): i32 * i33,
        (2, 2): i33 * i33,
    }

    def invat(aa, bb):
        return inv[(aa, bb)] if aa <= bb else inv[(bb, aa)]

    hg = [
        sum(invat(aa, bb) * gl[bb] for bb in range(3)) for aa in range(3)
    ]                                                     # Hll^-1 g_l  [1,TP]

    # --- per-observation cross/cam blocks ------------------------------
    Y = {}
    for ii in range(6):
        for kk in range(3):
            acc = Ju[ii] * Jlu[kk] + Jv[ii] * Jlv[kk]
            if use_stereo:
                acc = acc + Jw[ii] * Jlw[kk]
            Y[(ii, kk)] = w * acc
    # Lh = Li^T (upper): Lh[j][k] = Li[k][j], tiled per obs
    Lh = [[None] * 3 for _ in range(3)]
    for jj in range(3):
        for kk in range(jj, 3):
            Lh[jj][kk] = jnp.tile(Li[kk][jj], (1, O))
    hg_t = [jnp.tile(h, (1, O)) for h in hg]

    if use_stereo:
        gc_planes = [
            w * (Ju[ii] * rx + Jv[ii] * ry + Jw[ii] * rw) for ii in range(6)
        ]
    else:
        gc_planes = [w * (Ju[ii] * rx + Jv[ii] * ry) for ii in range(6)]
    gred_planes = [
        sum(Y[(ii, jj)] * hg_t[jj] for jj in range(3)) for ii in range(6)
    ]
    hcc_planes = []
    for ii in range(6):
        for jj in range(6):
            aa, bb = min(ii, jj), max(ii, jj)
            acc = Ju[aa] * Ju[bb] + Jv[aa] * Jv[bb]
            if use_stereo:
                acc = acc + Jw[aa] * Jw[bb]
            hcc_planes.append(w * acc)

    # --- camera-side reductions: transposed one-hot matmuls -----------
    def cam_reduce(planes):
        stack = jnp.concatenate(planes, axis=0)          # [k, OTP]
        return jax.lax.dot_general(
            ET, stack, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [C1, k]

    hcc_tile = cam_reduce(hcc_planes)
    gc_tile = cam_reduce(gc_planes)
    gred_tile = cam_reduce(gred_planes)

    # --- pair term: Z slabs, S_pair += Z Z^T ---------------------------
    # Z[(ii)*C1 + c, kk*TP + p] = sum_o ET[c, o*TP+p] * (Y Lh)[ii,kk][o*TP+p]
    for ii in range(6):
        for kk in range(3):
            # Lh is upper triangular: only j <= k terms exist
            yl = sum(
                Y[(ii, jj)] * Lh[jj][kk] for jj in range(kk + 1)
            )                                            # [1, OTP]
            # row-slice a [O, TP] view: lane-offset slices of a [1, N]
            # vector cannot be re-broadcast by Mosaic, sublane slices can
            ylm = yl.reshape(O, TP)
            slab = ET[:, 0:TP] * ylm[0:1, :]
            for o in range(1, O):
                slab = slab + (
                    ET[:, o * TP : (o + 1) * TP] * ylm[o : o + 1, :]
                )
            z2_scr[ii * C1 : (ii + 1) * C1, kk * TP : (kk + 1) * TP] = slab
    z2 = z2_scr[...]
    s_tile = jax.lax.dot_general(
        z2, z2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                    # [6C1, 6C1]

    # --- accumulate camera-side outputs across the landmark grid ------
    @pl.when(i == 0)
    def _():
        hcc_ref[...] = jnp.zeros_like(hcc_ref)
        gc_ref[...] = jnp.zeros_like(gc_ref)
        gred_ref[...] = jnp.zeros_like(gred_ref)
        s_ref[...] = jnp.zeros_like(s_ref)

    hcc_ref[...] += hcc_tile
    gc_ref[...] += gc_tile
    gred_ref[...] += gred_tile
    s_ref[...] += s_tile

    # --- per-landmark outputs ------------------------------------------
    hllinv_ref[0] = jnp.concatenate(
        [invat(aa, bb) for aa in range(3) for bb in range(3)], axis=1
    )                                                    # [1, 9*TP]
    gl_ref[0] = jnp.concatenate(gl, axis=1)              # [1, 3*TP]
    yout_ref[0] = jnp.concatenate(
        [Y[(ii, kk)] for ii in range(6) for kk in range(3)], axis=1
    )                                                    # [1, 18*O*TP]


@functools.partial(
    jax.jit, static_argnames=("fx", "fy", "cx", "cy", "bf", "delta2_stereo")
)
def schur_reduce(
    R: jax.Array,        # f32[C, 3, 3]
    t: jax.Array,        # f32[C, 3]
    cam_opt: jax.Array,  # bool[C]
    xyz: jax.Array,      # f32[P, 3]
    obs_cam: jax.Array,  # i32[P, O] (>= C: invalid)
    obs_uv: jax.Array,   # f32[P, O, 2]
    obs_w: jax.Array,    # f32[P, O]  information weights (0 = invalid)
    lam: jax.Array,      # f32 scalar damping
    fx: float, fy: float, cx: float, cy: float,
    delta2: float = 5.991,
    obs_ur: jax.Array | None = None,  # f32[P, O] right-x; <0 = mono obs
    bf: float = 0.0,
    delta2_stereo: float = 7.815,
):
    """One fused BA reduction pass.

    Returns (Hll_inv [P,3,3], g_l [P,3], Y [P,O,6,3], Hcc [C,6,6],
    g_c [C,6], g_red [C,6], S_pair [C,6,C,6]) — exactly the quantities
    solve_ba's einsum chain produces, with identical damping/Huber math.
    With ``obs_ur`` and ``bf > 0``, observations whose right-x is >= 0 add
    the stereo (uR) third residual row with Huber ``delta2_stereo``.
    """
    C = R.shape[0]
    P, O = obs_cam.shape
    use_stereo = obs_ur is not None and bf > 0
    # sublane-align the camera axis (Mosaic rejects [1,N]->[C1,N] broadcasts
    # to non-multiple-of-8 sublane counts); extra rows are zero cameras that
    # only ever see zero-weight observations
    C1 = -(-(C + 1) // 8) * 8
    Pt = -(-P // TP)
    Pp = Pt * TP

    camtab = jnp.concatenate(
        [
            R.reshape(C, 9),
            t,
            cam_opt.astype(jnp.float32)[:, None],
            jnp.zeros((C, 3), jnp.float32),
        ],
        axis=1,
    )                                                    # [C, 16]
    camtab = jnp.concatenate(
        [camtab, jnp.zeros((C1 - C, 16), jnp.float32)], axis=0
    ).T                                                  # [16, C1]

    # the singleton middle axis satisfies the Pallas last-two-dims block
    # rule ((1, X) blocks of a (Pt, X) array are rejected once Pt > 1)
    def obs_major(x, fill):
        x = jnp.pad(x, ((0, Pp - P), (0, 0)), constant_values=fill)
        return jnp.transpose(x.reshape(Pt, TP, O), (0, 2, 1)).reshape(
            Pt, 1, O * TP
        )

    cam_t = obs_major(jnp.clip(obs_cam, 0, C), C)        # pad row = sentinel C
    u_t = obs_major(obs_uv[..., 0], 0.0)
    v_t = obs_major(obs_uv[..., 1], 0.0)
    w_t = obs_major(obs_w, 0.0)
    xyz_p = jnp.pad(xyz, ((0, Pp - P), (0, 0)))
    x_t = xyz_p[:, 0].reshape(Pt, 1, TP)
    y_t = xyz_p[:, 1].reshape(Pt, 1, TP)
    z_t = xyz_p[:, 2].reshape(Pt, 1, TP)
    params = jnp.stack(
        [
            lam.astype(jnp.float32),
            jnp.float32(delta2),
            jnp.float32(bf),
            jnp.float32(delta2_stereo),
        ]
    ).reshape(1, 4)

    kernel = functools.partial(_kernel, fx, fy, cx, cy, O, C1, use_stereo)
    obs_plane = pl.BlockSpec(
        (1, 1, O * TP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    lm_plane = pl.BlockSpec(
        (1, 1, TP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((16, C1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        obs_plane, obs_plane, obs_plane, obs_plane,
    ]
    inputs = [params, camtab, cam_t, u_t, v_t, w_t]
    if use_stereo:
        in_specs.append(obs_plane)
        inputs.append(obs_major(obs_ur, -1.0))
    in_specs += [lm_plane, lm_plane, lm_plane]
    inputs += [x_t, y_t, z_t]
    hllinv, gl, yout, hcc, gc, gred, s2 = pl.pallas_call(
        kernel,
        grid=(Pt,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, 9 * TP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3 * TP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 18 * O * TP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C1, 36), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C1, 6), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C1, 6), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6 * C1, 6 * C1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Pt, 1, 9 * TP), jnp.float32),
            jax.ShapeDtypeStruct((Pt, 1, 3 * TP), jnp.float32),
            jax.ShapeDtypeStruct((Pt, 1, 18 * O * TP), jnp.float32),
            jax.ShapeDtypeStruct((C1, 36), jnp.float32),
            jax.ShapeDtypeStruct((C1, 6), jnp.float32),
            jax.ShapeDtypeStruct((C1, 6), jnp.float32),
            jax.ShapeDtypeStruct((6 * C1, 6 * C1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((6 * C1, 3 * TP), jnp.float32)],
        interpret=interpret_mode(),
    )(*inputs)

    # --- reconstruct jnp-layout outputs --------------------------------
    Hll_inv = hllinv.reshape(Pt, 9, TP).transpose(0, 2, 1).reshape(Pp, 3, 3)[:P]
    g_l = gl.reshape(Pt, 3, TP).transpose(0, 2, 1).reshape(Pp, 3)[:P]
    Y = (
        yout.reshape(Pt, 18, O, TP)
        .transpose(0, 3, 2, 1)
        .reshape(Pp, O, 6, 3)[:P]
    )
    Hcc = hcc[:C].reshape(C, 6, 6)
    g_c = gc[:C]
    g_red = gred[:C]
    S_pair = (
        s2.reshape(6, C1, 6, C1)[:, :C, :, :C].transpose(1, 0, 3, 2)
    )                                                    # [C, 6, C, 6]
    return Hll_inv, g_l, Y, Hcc, g_c, g_red, S_pair


def available(C: int, P: int, O: int) -> bool:
    """Kernel applicability: VMEM budget bounds C; Pallas path enabled."""
    return use_pallas() and (C + 1) <= MAX_CAMS and O <= 16
