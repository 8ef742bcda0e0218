"""Demo: batched fleet solve — many independent 2D transport problems
advanced in lockstep by one device loop (a capability the reference lacks;
combine with a device mesh for SPMD fleets).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--nx", type=int, default=65)
    ap.add_argument("--nt", type=int, default=17)
    ap.add_argument("--levels", type=int, default=2)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the fleet over all visible devices")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dotsocp_tpu.models.examples import get_example_2d
    from dotsocp_tpu.parallel.batch import solve_batch

    rng = np.random.default_rng(0)
    r0s, r1s = [], []
    base0, base1 = get_example_2d("example2", args.nx, args.nx)
    for b in range(args.batch):
        shift = int(rng.integers(0, args.nx // 4))
        r0s.append(np.roll(base0, shift, axis=1))
        r1s.append(np.roll(base1, -shift, axis=0))

    mesh = None
    if args.mesh:
        from dotsocp_tpu.parallel.sharding import make_mesh

        mesh = make_mesh()
        print("mesh:", dict(mesh.shape))

    out = solve_batch(
        np.stack(r0s), np.stack(r1s), args.nt,
        {"tol": args.tol, "maxit": 3000},
        level_n=args.levels, dtype=jnp.float32, mesh=mesh,
    )
    print("per-instance max KKT:", out["kkt"][:, [0, 2, 5, 6]].max(axis=1))
    print("converged:", out["done"], "at lockstep iteration", out["done_it"])


if __name__ == "__main__":
    main()
