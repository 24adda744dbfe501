"""Probe: device time of the fused mapper program (triangulation + local BA)
and its pieces, at the pinned shapes of ops/mapper_step.

Usage: python tools/probe_mapper_compute.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    """Force completion: block_until_ready is a no-op through the axon
    tunnel; a real D2H pull of one element is the only reliable barrier."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[:1])


def bench(fn, *args, reps=5, label=""):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:32s} {1e3*dt:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/movslam_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from movslam_tpu.ops.mapper_step import (
        BA_K, BA_MOPP, BA_O, BA_P, TRI_CAP, mapper_step_wire,
    )
    from movslam_tpu.ops.ba import ba_solve_wire, build_obs_by_point
    from movslam_tpu.ops.triangulate import triangulate_pairs

    rng = np.random.default_rng(0)

    # Realistic-ish BA problem: 24 opt KFs + fixed, ~1500 points, ~6000 obs.
    K, P, O, MOPP = BA_K, BA_P, BA_O, BA_MOPP
    kf_pack = np.zeros((K, 14), np.float32)
    kf_pack[:, 0] = kf_pack[:, 4] = kf_pack[:, 8] = 1.0
    kf_pack[:, 9:12] = rng.normal(0, 0.5, (K, 3))
    kf_pack[:, 12] = (np.arange(K) >= 24) | (np.arange(K) == 0)
    kf_pack[:, 13] = 1.0
    mp_pack = np.zeros((P, 4), np.float32)
    mp_pack[:, 0:3] = rng.normal(0, 2, (P, 3))
    mp_pack[:, 2] += 10
    mp_pack[:, 3] = 1.0
    n_obs = 6000
    obs_pack = np.zeros((O, 6), np.float32)
    obs_pack[:n_obs, 0] = rng.integers(0, K, n_obs)
    obs_pack[:n_obs, 1] = rng.integers(0, P, n_obs)
    obs_pack[:n_obs, 2:4] = rng.uniform(0, 640, (n_obs, 2))
    obs_pack[:n_obs, 4] = -1.0
    obs_pack[:n_obs, 5] = 1.0
    obp = build_obs_by_point(
        np.where(obs_pack[:, 5] > 0, obs_pack[:, 1], P).astype(np.int64), P, MOPP, O
    )
    ba_wire = np.concatenate(
        [kf_pack.reshape(-1), mp_pack.reshape(-1), obs_pack.reshape(-1),
         obp.reshape(-1).astype(np.float32)]
    )

    tri_wire = np.zeros((TRI_CAP + 1, 32), np.float32)
    tri_wire[0, 0:12] = np.eye(3, 4).reshape(-1)
    tri_wire[0, 12:21] = np.eye(3).reshape(-1)
    tri_wire[1:, 0:12] = np.tile(np.eye(3, 4).reshape(-1), (TRI_CAP, 1))
    tri_wire[1:, 12:16] = rng.uniform(0, 480, (TRI_CAP, 4))
    tri_wire[1:, 16:25] = np.eye(3).reshape(-1)
    tri_wire[1:, 29] = 1.0

    intr = jnp.asarray([320.0, 320.0, 320.0, 240.0], jnp.float32)
    tri_dev = jnp.asarray(tri_wire)
    ba_dev = jnp.asarray(ba_wire)

    bench(
        lambda a, b: mapper_step_wire(a, b, intr, 0.0),
        tri_dev, ba_dev, label="mapper_step_wire BIG (tri+BA)",
    )
    # SMALL size class (the common live dispatch).
    from movslam_tpu.ops.mapper_step import MAPPER_SMALL

    Cs, Ks, Ps, Os = (
        MAPPER_SMALL["C"], MAPPER_SMALL["K"], MAPPER_SMALL["P"],
        MAPPER_SMALL["O"],
    )
    ba_small = np.concatenate(
        [
            kf_pack[:Ks].reshape(-1), mp_pack[:Ps].reshape(-1),
            obs_pack[:Os].reshape(-1),
            obp[:Ps].reshape(-1).astype(np.float32),
        ]
    )
    bench(
        lambda a, b: mapper_step_wire(a, b, intr, 0.0, C=Cs, K=Ks, P=Ps, O=Os),
        jnp.asarray(tri_wire[: Cs + 1]), jnp.asarray(ba_small),
        label="mapper_step_wire SMALL",
    )
    bench(
        lambda b: ba_solve_wire(b, intr, 0.0, K=K, P=P, O=O, MOPP=MOPP),
        ba_dev, label=f"ba_solve_wire K={K} P={P} O={O}",
    )
    P1 = jnp.asarray(np.eye(3, 4), jnp.float32)
    P2s = jnp.asarray(tri_wire[1:, 0:12].reshape(-1, 3, 4))
    uv1 = jnp.asarray(tri_wire[1:, 12:14])
    uv2 = jnp.asarray(tri_wire[1:, 14:16])
    tri_jit = jax.jit(triangulate_pairs)
    bench(tri_jit, P1, P2s, uv1, uv2, label=f"triangulate_pairs C={TRI_CAP}")

    # BA iteration scaling: 1 vs 10 iters isolates per-iteration cost.
    bench(
        lambda b: ba_solve_wire(b, intr, 0.0, K=K, P=P, O=O, MOPP=MOPP, iters=1),
        ba_dev, label="ba_solve_wire iters=1",
    )


if __name__ == "__main__":
    main()
