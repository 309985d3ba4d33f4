"""Worker process for the multi-host distributed test.

Launched N times by ``test_distributed.py`` with the coordinator triplet in
env vars; each process owns 2 forced CPU devices.  Builds the (ensemble,
node) multihost mesh, runs the sharded collision operator on a globally
sharded BKW ensemble, allgathers the result, and writes its copy to disk —
the parent asserts cross-process agreement with a single-process reference.
"""

import os
import sys

import numpy as np


def main():
    out_path = sys.argv[1]

    import jax
    import jax.numpy as jnp

    import boltzfft as bz

    assert bz.initialize_distributed(), "distributed runtime failed to start"
    rank = jax.process_index()
    assert jax.process_count() == int(os.environ["JAX_NUM_PROCESSES"])
    assert jax.device_count() == 2 * jax.process_count()

    mesh = bz.make_multihost_mesh()  # (ensemble = n_hosts, node = 2)
    cfg = bz.CollisionConfig(nv=8, ns=6, n_radial=4, impl="rfft", dtype="float32")
    collide_fn, pre = bz.make_sharded_collision_operator(
        cfg, mesh, node_axis=bz.NODE_AXIS, ensemble_axis=bz.ENSEMBLE_AXIS
    )
    pre = bz.place(pre, mesh)

    e_total = 2 * jax.process_count()
    g = cfg.velocity_grid
    f_one = np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float32)
    scales = np.linspace(0.5, 1.5, e_total).astype(np.float32)
    f_global = scales[:, None, None, None] * f_one[None]

    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(bz.ENSEMBLE_AXIS))
    f = jax.make_array_from_callback(
        f_global.shape, sharding, lambda idx: f_global[idx]
    )
    q = collide_fn(f, pre)

    from jax.experimental import multihost_utils

    q_full = np.asarray(multihost_utils.process_allgather(q, tiled=True))
    np.save(f"{out_path}.{rank}.npy", q_full)
    print(f"rank {rank} ok: q_full shape {q_full.shape}")


if __name__ == "__main__":
    main()
