"""Space-inhomogeneous 3D×3V production demo: the full-phase-space kinetic
Taylor-Green vortex.

Solves ``df/dt + v·∇f = Q(f,f)/Kn`` on a periodic cube with Strang splitting
(second-order MUSCL transport on all three spatial axes, per-cell spectral
collisions) — the six-dimensional phase space (Cx, Cy, Cz, Nvx, Nvy, Nvz).
The classic 3D Taylor-Green field

    u(x,y,z) = U0 ( sin(kx) cos(ky) cos(kz), -cos(kx) sin(ky) cos(kz), 0 )

(k = 2π/L) initializes per-cell Maxwellians; the vortex decays through phase
mixing and collisional viscosity, monitored by total mass, bulk kinetic
energy, and the Boltzmann H functional (non-increasing along the full
kinetic evolution — the no-oracle physics gate).  The reference code has no
spatial transport at all (SURVEY.md §0, `maxwell_bkw_fftw.cpp` is a
homogeneous single-eval benchmark); this is the full production workload
its collision kernel exists to feed, completing the 1D (`sod_1d3v`) → 2D
(`taylor_green_2d3v`) → 3D dimensional ladder.

Two execution modes:

* default — single device, cells vmapped over the flattened cell list (the
  whole multi-cell step is one jitted program; the collision substep
  batches all Cx·Cy·Cz cells into the spectral pipeline).
* ``--mesh MXxMYxMZ`` — explicit 3-D spatial domain decomposition over a
  device mesh (:func:`boltzfft.transport.make_sharded_step_3d`: shard_map,
  ppermute ring halo exchange per sharded axis, shard-local velocity FFTs).
  Validate on a virtual CPU mesh with
  ``XLA_FLAGS=--xla_force_host_platform_device_count=8``.

    python -m boltzfft.cli.taylor_green_3d3v --cells 8 --Nv 16 --steps 10
    python -m boltzfft.cli.taylor_green_3d3v --mesh 2x2x2 --cells 8
"""

from __future__ import annotations

import sys
import time

import numpy as np


def taylor_green_f0_3d(cfg, nc: int, *, u0: float, temperature: float,
                       length: float = 1.0):
    """Per-cell Maxwellian initial data with the 3D Taylor-Green bulk field.

    Returns ``(nc, nc, nc, Nvx, Nvy, Nvz)``.
    """
    import jax.numpy as jnp

    from boltzfft.bkw import maxwellian

    g = cfg.velocity_grid
    x = (np.arange(nc) + 0.5) * (length / nc)
    k = 2.0 * np.pi / length
    sx, cx = np.sin(k * x), np.cos(k * x)
    ux = u0 * sx[:, None, None] * cx[None, :, None] * cx[None, None, :]
    uy = -u0 * cx[:, None, None] * sx[None, :, None] * cx[None, None, :]
    # uz = 0 (classic TG); build f cell-row by cell-row to bound host memory
    vx = np.asarray(g.vx)
    vy = np.asarray(g.vy)
    vz = np.asarray(g.vz)
    out = np.empty((nc, nc, nc, vx.size, vy.size, vz.size), np.float64)
    vz_sq = vz[None, None, None, None, :] ** 2
    for i in range(nc):
        vsq = (
            (vx[None, None, :, None, None] - ux[i][:, :, None, None, None]) ** 2
            + (vy[None, None, None, :, None] - uy[i][:, :, None, None, None]) ** 2
            + vz_sq
        )
        out[i] = np.asarray(
            maxwellian(vsq, density=1.0, temperature=temperature)
        )
    return jnp.asarray(out, cfg.real_dtype)


def main(argv=None):
    from boltzfft.cli import default_dtype, standard_parser, vhs_kwargs

    # Ns=12 default for the same reason as the 2D driver: bulk-shifted
    # (anisotropic) states see the k=0 gain/loss quadrature mismatch, and
    # the mass drift is the design's quadrature error, not advection error.
    p = standard_parser(__doc__.splitlines()[0])
    p.set_defaults(Nv=16, Ns=12, impl="auto")
    p.add_argument("--cells", type=int, default=8,
                   help="spatial cells per axis (periodic cube)")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--x-length", type=float, default=1.0)
    p.add_argument("--knudsen", type=float, default=0.2)
    p.add_argument("--u0", type=float, default=0.8,
                   help="Taylor-Green bulk-velocity amplitude")
    p.add_argument("--temperature", type=float, default=3.0)
    p.add_argument("--dt", type=float, default=None,
                   help="time step (default: CFL-limited for the transport)")
    p.add_argument("--mesh", type=str, default=None, metavar="MXxMYxMZ",
                   help="spatial device decomposition, e.g. 2x2x2 (default: "
                        "single device, cells vmapped)")
    p.add_argument("--scheme", choices=["muscl", "upwind"], default="muscl")
    p.add_argument("--conserve", action="store_true",
                   help="project every Q onto vanishing invariant moments\n(bz.conservative): exact per-step mass/momentum/energy at a small\npointwise perturbation within the method-error class on resolved grids")
    p.add_argument("--mass-tol", type=float, default=1e-2,
                   help="relative mass-drift gate (gain-quadrature "
                        "mass-moment error on anisotropic states; see the "
                        "2D driver's calibration note)")
    p.add_argument("--h-tol", type=float, default=0.01,
                   help="H-theorem gate: max allowed per-step H increase as "
                        "a fraction of the total dissipation |H_end - H_0|")
    args = p.parse_args(argv)

    from boltzfft.cli import enable_cache_default, resolve_impl
    enable_cache_default()

    import jax
    import jax.numpy as jnp

    import boltzfft as bz
    from boltzfft import transport

    if args.impl == "ds":
        p.error("--impl ds is homogeneous-relaxation only; the 3D solver "
                "drives the f32 pipelines (rfft/c2c/dft/fused)")

    dtype = args.dtype or default_dtype()
    cfg = bz.CollisionConfig(
        nv=args.Nv, nvy=args.Nvy, nvz=args.Nvz, ns=args.Ns, impl=resolve_impl(args.impl),
        dtype=dtype, node_chunk=args.node_chunk,
        n_radial=args.n_radial or args.Nv, **vhs_kwargs(args),
    )
    g = cfg.velocity_grid
    nc = args.cells
    d = args.x_length / nc
    dt = args.dt or transport.cfl_dt(
        float(np.abs(np.asarray(g.v)).max()), d
    )
    collide_fn, pre = bz.make_collision_operator(cfg, jit=False)
    if args.conserve:
        collide_fn = bz.conservative(
            collide_fn, bz.build_conserve_precomp(cfg, temperature=args.temperature)
        )

    if args.mesh:
        try:
            mx, my, mz = (int(s) for s in args.mesh.lower().split("x"))
        except ValueError:
            p.error(f"--mesh must look like 2x2x2, got {args.mesh!r}")
        if nc % mx or nc % my or nc % mz:
            p.error(f"--cells {nc} not divisible by mesh {mx}x{my}x{mz}")
        mesh = bz.make_mesh([("cx", mx), ("cy", my), ("cz", mz)])
        step = transport.make_sharded_step_3d(
            cfg, collide_fn, mesh, dx=d, dy=d, dz=d, dt=dt,
            knudsen=args.knudsen, x_axis="cx", y_axis="cy", z_axis="cz",
            scheme=args.scheme, jit=False,
        )
        mode = (f"spatial decomposition {mx}x{my}x{mz} devices, "
                f"{nc // mx}x{nc // my}x{nc // mz} cells/shard")
    else:
        mesh = None
        step = transport.make_inhomogeneous_step_3d(
            cfg, collide_fn, dx=d, dy=d, dz=d, dt=dt, knudsen=args.knudsen,
            scheme=args.scheme,
        )
        mode = "single device, cells vmapped"

    f0 = taylor_green_f0_3d(cfg, nc, u0=args.u0,
                            temperature=args.temperature,
                            length=args.x_length)
    if mesh is not None:
        f0 = bz.place_cells(f0, mesh, x_axis="cx", y_axis="cy", z_axis="cz")

    dv3 = g.cell_volume
    cell_vol = d ** 3
    # host np constants (device closure constants wedge remote-TPU tunnels)
    vx = np.asarray(g.vx, cfg.real_dtype).reshape(1, 1, 1, -1, 1, 1)
    vy = np.asarray(g.vy, cfg.real_dtype).reshape(1, 1, 1, 1, -1, 1)

    @jax.jit
    def diagnostics(f):
        # moments reduce on device; only 3 scalars cross the host boundary
        rho = jnp.sum(f, axis=(3, 4, 5)) * dv3
        mom_x = jnp.sum(f * vx, axis=(3, 4, 5)) * dv3
        mom_y = jnp.sum(f * vy, axis=(3, 4, 5)) * dv3
        ke = 0.5 * jnp.sum((mom_x**2 + mom_y**2) / rho) * cell_vol
        h = jnp.sum(bz.entropy(f, cell_volume=dv3)) * cell_vol
        return jnp.sum(rho) * cell_vol, ke, h

    # chain every step in ONE jitted program (tunneled-TPU dispatch costs
    # ~30 ms/call; docs/PERFORMANCE.md "timing methodology"), carrying the
    # per-step H trace out as scalars
    @jax.jit
    def run(f, pre):
        def body(x, _):
            x = step(x, pre)
            return x, diagnostics(x)
        return jax.lax.scan(body, f, None, length=args.steps)

    n_cells = nc ** 3
    print(f"\nkinetic Taylor-Green 3D×3V: {nc}^3 cells x "
          f"{'x'.join(str(s) for s in cfg.grid_shape)} velocities, "
          f"Ns={args.Ns} impl={cfg.impl} dtype={dtype} scheme={args.scheme}")
    print(f"dt={dt:.4f} Kn={args.knudsen} U0={args.u0} ({mode})")

    mass0, ke0, h0 = (float(v) for v in diagnostics(f0))
    best = None
    for trial in range(args.trials):
        t0 = time.perf_counter()
        f, (mass_tr, ke_tr, h_tr) = run(f0, pre)
        h_trace = np.asarray(h_tr, np.float64)  # D2H syncs the chain
        wall = time.perf_counter() - t0
        best = wall if best is None else min(best, wall)
        tag = " (compile)" if trial == 0 and args.trials > 1 else ""
        print(f"trial {trial}: {args.steps} steps in {wall:.2f}s = "
              f"{args.steps * n_cells * 2 / wall:.1f} collision evals/s "
              f"aggregate{tag}")
    mass1, ke1 = float(mass_tr[-1]), float(ke_tr[-1])

    drift = abs(mass1 - mass0) / mass0
    print(f"total mass: {mass0:.6f} -> {mass1:.6f} (rel drift {drift:.2e}; "
          f"gain-quadrature mass-moment error at Ns={cfg.ns})")
    print(f"bulk-KE: {ke0:.6f} -> {ke1:.6f} "
          f"({100.0 * ke1 / ke0:.1f}% of initial)")
    trace = np.concatenate(([h0], h_trace))
    stride = max(1, args.steps // 8)
    samples = " ".join(
        f"{h:.6f}" for h in trace[:: stride][: (args.steps // stride) + 1]
    )
    print(f"H trace (every {stride} steps): {samples} -> {trace[-1]:.6f}")
    h_steps = np.diff(trace)
    worst_rise = float(h_steps.max())
    dissipated = h0 - float(trace[-1])
    print(f"H: {h0:.6f} -> {trace[-1]:.6f} (dissipated {dissipated:.3e}; "
          f"worst per-step rise {worst_rise:.3e})")
    if not (ke1 < ke0):
        print("FAIL: bulk kinetic energy must decay", file=sys.stderr)
        return 1
    if not np.isfinite(ke1) or drift > args.mass_tol:
        print("FAIL: conservation check", file=sys.stderr)
        return 1
    if not (dissipated > 0.0) or worst_rise > args.h_tol * dissipated:
        print("FAIL: H-theorem gate (entropy must dissipate monotonically "
              f"within --h-tol {args.h_tol})", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
