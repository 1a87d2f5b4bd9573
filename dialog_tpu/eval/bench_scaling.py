"""Distributed-BA scaling harness (BASELINE metric: fps @ 1 chip/1 host/N).

Builds a large synthetic SfM problem (1k+ cameras, 100k+ landmarks —
BASELINE config[3]), solves it with the landmark-sharded Schur LM on
meshes of increasing size, and reports solve time + scaling efficiency.
On a single chip with a virtual CPU mesh this validates the sharded path
and measures collective overhead; real efficiency numbers require real
multi-chip topologies (the driver's N-host runs).

Run: python -m dialog_tpu.eval.bench_scaling [n_cams] [n_pts]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sfm_problem(cfg, n_cams: int, n_pts: int, seed: int = 0):
    """Ring of cameras around a large cloud; every point seen by O nearby cams."""
    from ..optim.local_ba import BAProblem
    from .. import geometry as geo

    rng = np.random.default_rng(seed)
    O = cfg.max_obs_per_lm
    ang = rng.uniform(0, 2 * np.pi, n_pts)
    rad = rng.uniform(12, 20, n_pts)
    pts = np.stack(
        [rad * np.sin(ang), rng.uniform(-3, 3, n_pts), rad * np.cos(ang)], -1
    ).astype(np.float32)

    Rs = np.zeros((n_cams, 3, 3), np.float32)
    ts = np.zeros((n_cams, 3), np.float32)
    for k in range(n_cams):
        th = 2 * np.pi * k / n_cams
        fwd = np.array([np.sin(th), 0, np.cos(th)])
        eye = 10.0 * fwd
        right = np.cross(fwd, [0, -1, 0]); right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        Rs[k] = np.stack([right, down, fwd])
        ts[k] = -Rs[k] @ eye

    # each point observed by O cameras nearest in ring angle
    cam_angle = 2 * np.pi * np.arange(n_cams) / n_cams
    base = np.argmin(
        np.abs(((ang[:, None] - cam_angle[None, :]) + np.pi) % (2 * np.pi) - np.pi),
        axis=1,
    )
    obs_cam = ((base[:, None] + np.arange(O)[None, :] - O // 2) % n_cams).astype(np.int32)
    Xc = np.einsum("poij,pj->poi", Rs[obs_cam], pts) + ts[obs_cam]
    z = Xc[..., 2]
    u = cfg.fx * Xc[..., 0] / np.maximum(z, 1e-6) + cfg.cx
    v = cfg.fy * Xc[..., 1] / np.maximum(z, 1e-6) + cfg.cy
    ok = (z > 0.2) & (u > 0) & (u < cfg.width) & (v > 0) & (v < cfg.height)
    uv = np.stack([u, v], -1) + rng.normal(0, 0.5, (n_pts, O, 2))

    # perturb
    pts_n = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    cam_opt = np.ones(n_cams, bool); cam_opt[:2] = False
    for k in range(2, n_cams):
        xi = rng.normal(0, 0.01, 6).astype(np.float32)
        from .. import geometry as g
        R2, t2 = g.se3_retract(jnp.asarray(Rs[k]), jnp.asarray(ts[k]), jnp.asarray(xi))
        Rs[k], ts[k] = np.asarray(R2), np.asarray(t2)

    return BAProblem(
        cam_slots=jnp.arange(n_cams, dtype=jnp.int32),
        cam_opt=jnp.asarray(cam_opt),
        R=jnp.asarray(Rs), t=jnp.asarray(ts),
        lm_ids=jnp.arange(n_pts, dtype=jnp.int32),
        xyz=jnp.asarray(pts_n),
        obs_cam=jnp.asarray(np.where(ok, obs_cam, n_cams)),
        obs_uv=jnp.asarray(uv.astype(np.float32)),
        obs_w=jnp.asarray(ok.astype(np.float32)),
        obs_ok=jnp.asarray(ok),
        obs_feat=jnp.zeros((n_pts, O), jnp.int32),
    )


def main() -> None:
    from ..config import EngineConfig
    from ..optim.global_ba import DENSE_SCHUR_MAX_CAMS
    from ..optim.local_ba import solve_ba as solve_dense
    from ..optim.schur_pcg import solve_ba_pcg

    n_cams = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    cfg = EngineConfig(max_obs_per_lm=8)
    # same size policy as the engine's global BA: matrix-free Schur PCG
    # once the dense reduced system stops being tractable
    if n_cams > DENSE_SCHUR_MAX_CAMS:
        def solve_ba(p, cfg, iters):
            # sharded operands: construction chunking off (it would force a
            # GSPMD reshard per slab; sharding already divides the footprint)
            return solve_ba_pcg(p, cfg, iters=iters, chunk=False)
    else:
        solve_ba = solve_dense
    prob = make_sfm_problem(cfg, n_cams, n_pts)
    n_dev = len(jax.devices())
    results = {}
    sizes = sorted({1, n_dev})
    for nd in sizes:
        mesh = Mesh(np.array(jax.devices()[:nd]), ("data",))
        lm1 = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())

        def put(x, s):
            return jax.device_put(x, s)

        p = prob._replace(
            cam_slots=put(prob.cam_slots, repl), cam_opt=put(prob.cam_opt, repl),
            R=put(prob.R, repl), t=put(prob.t, repl),
            lm_ids=put(prob.lm_ids, lm1),
            xyz=put(prob.xyz, NamedSharding(mesh, P("data", None))),
            obs_cam=put(prob.obs_cam, NamedSharding(mesh, P("data", None))),
            obs_uv=put(prob.obs_uv, NamedSharding(mesh, P("data", None, None))),
            obs_w=put(prob.obs_w, NamedSharding(mesh, P("data", None))),
            obs_ok=put(prob.obs_ok, NamedSharding(mesh, P("data", None))),
            obs_feat=put(prob.obs_feat, NamedSharding(mesh, P("data", None))),
        )
        out = solve_ba(p, cfg, iters=2)          # compile
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        out = solve_ba(p, cfg, iters=5)
        jax.block_until_ready(out[0])
        results[nd] = (time.perf_counter() - t0) / 5.0
        print(f"devices={nd}: {results[nd]*1e3:.1f} ms / LM iteration", flush=True)
    if len(sizes) == 2 and sizes[1] > 1:
        # NOTE: on a virtual CPU mesh "devices" share the same physical
        # socket, so wall-clock cannot improve with device count — this
        # efficiency number validates the sharded path + measures collective
        # overhead, not real speedup (that needs real chips: the per-device
        # work is 1/N of the landmark axis; see SURVEY.md §7.6)
        record = {
            "metric": "global_ba_scaling_efficiency",
            "value": round(results[1] / (results[sizes[1]] * sizes[1]), 3),
            "devices": sizes[1],
            "n_cams": n_cams,
            "n_pts": n_pts,
            "backend": jax.default_backend(),
            "ms_per_iter": {str(k): round(v * 1e3, 2) for k, v in results.items()},
            "virtual_mesh": jax.default_backend() == "cpu",
        }
        print(json.dumps(record))
        with open("SCALING.json", "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
