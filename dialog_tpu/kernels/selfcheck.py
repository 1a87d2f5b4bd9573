"""On-device kernel parity check: Pallas vs jnp reference on the live backend.

Run on TPU (`python -m dialog_tpu.kernels.selfcheck`) to verify the Pallas
paths bit-match their reference implementations on real hardware — the CPU
test suite can only exercise the reference paths.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def check_hamming(n=700, m=900, seed=0) -> dict:
    from .hamming import hamming_best2, _reference

    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (m, 8), dtype=np.uint32))
    va = jnp.asarray(rng.random(n) > 0.1)
    vb = jnp.asarray(rng.random(m) > 0.1)
    uva = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
    uvb = jnp.asarray(rng.uniform(0, 640, (m, 2)).astype(np.float32))
    r2 = jnp.asarray((rng.uniform(20, 200, n) ** 2).astype(np.float32))
    oa = jnp.asarray(rng.integers(0, 8, n).astype(np.int32))
    ob = jnp.asarray(rng.integers(0, 8, m).astype(np.int32))

    results = {}
    for name, kw in [
        ("plain", {}),
        ("spatial", dict(uv_a=uva, uv_b=uvb, radius2=r2)),
        ("spatial+oct", dict(uv_a=uva, uv_b=uvb, radius2=r2, oct_a=oa, oct_b=ob, octave_band=1)),
        ("col-radius", dict(uv_a=uva, uv_b=uvb, radius2_cols=jnp.asarray((rng.uniform(20, 200, m) ** 2).astype(np.float32)))),
    ]:
        got = hamming_best2(a, b, va, vb, **kw)
        want = _reference(
            a, b, va, vb,
            kw.get("uv_a", jnp.zeros((n, 2))), kw.get("uv_b", jnp.zeros((m, 2))),
            kw.get("radius2", jnp.full((n,), -1.0)),
            kw.get("radius2_cols", jnp.full((m,), -1.0)),
            kw.get("oct_a", jnp.zeros((n,), jnp.int32)),
            kw.get("oct_b", jnp.zeros((m,), jnp.int32)),
            kw.get("octave_band", -1),
        )
        same = all(
            bool(jnp.array_equal(g, w)) for g, w in zip(got, want)
        )
        results[name] = same
    return results


def check_fast(h=123, w=210, seed=1) -> dict:
    from .fast import fast_nms_rank, _reference

    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    results = {}
    for name, (min_th, th_fast, border) in [
        ("default", (7.0, 20.0, 19)),
        ("low-th", (3.0, 10.0, 8)),
    ]:
        got = fast_nms_rank(img, min_th, th_fast, border)
        want = _reference(img, min_th, th_fast, border)
        results[name] = bool(jnp.array_equal(got, want))
    return results


def check_schur(seed=0) -> dict:
    """Fused Schur kernel vs the jnp einsum reduction, through solve_ba.

    Tolerance-based (f32 contraction orders differ); the comparison runs
    the full LM loop so damping/acceptance interplay is covered too.
    """
    from ..optim.local_ba import solve_ba
    from ..optim.synth_problem import FIXTURE_CFG as CFG, make_problem

    prob, Rs, ts, pts, n_cams, n_pts = make_problem(seed=seed)
    Rk, tk, xk, _ = solve_ba(prob, CFG, iters=5, use_kernel=True)
    Rj, tj, xj, _ = solve_ba(prob, CFG, iters=5, use_kernel=False)
    results = {
        "R": bool(jnp.max(jnp.abs(Rk - Rj)) < 2e-3),
        "t": bool(jnp.max(jnp.abs(tk - tj)) < 2e-3),
        "xyz": bool(
            jnp.max(jnp.abs(xk[:n_pts] - xj[:n_pts])) < 5e-3
        ),
    }
    # stereo (3-row uR) edges through the same kernel (VERDICT r4 dir. 2/10)
    st_cfg = CFG.replace(bf=CFG.fx * 0.12)
    probs, _, _, _, _, n_pts_s = make_problem(
        seed=seed + 1, cfg=st_cfg, stereo_frac=0.6
    )
    Rk, tk, xk, _ = solve_ba(probs, st_cfg, iters=5, use_kernel=True)
    Rj, tj, xj, _ = solve_ba(probs, st_cfg, iters=5, use_kernel=False)
    results.update(
        {
            "stereo_R": bool(jnp.max(jnp.abs(Rk - Rj)) < 2e-3),
            "stereo_t": bool(jnp.max(jnp.abs(tk - tj)) < 2e-3),
            "stereo_xyz": bool(
                jnp.max(jnp.abs(xk[:n_pts_s] - xj[:n_pts_s])) < 5e-3
            ),
        }
    )
    return results


def main() -> None:
    print("backend:", jax.default_backend())
    res = check_hamming()
    for k, v in res.items():
        print(f"hamming[{k}]: {'OK' if v else 'MISMATCH'}")
    fres = check_fast()
    for k, v in fres.items():
        print(f"fast[{k}]: {'OK' if v else 'MISMATCH'}")
    sres = check_schur()
    for k, v in sres.items():
        print(f"schur[{k}]: {'OK' if v else 'MISMATCH'}")
    res.update({f"fast:{k}": v for k, v in fres.items()})
    res.update({f"schur:{k}": v for k, v in sres.items()})
    assert all(res.values()), res


if __name__ == "__main__":
    main()
