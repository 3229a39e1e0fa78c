"""Micro-bench: field-grid gradient scatter backends on the real chip.

Times jax.grad of a hexplane-shaped sample_mip sum w.r.t. the grid for
each SARO_GRID_SCATTER backend at training shapes (VERDICT r2 task 5:
make the shipped default a documented, quantified choice).

  xla    — scatter-add transpose (.at[].add), XLA's serial emitter
  pallas — sorted-window MXU accumulation kernel (ops/grid_scatter.py)

("window" in ops/mip.py dispatches to the same code as "xla"; it is an
alias kept for config compatibility.)

Usage: python scripts/grid_scatter_bench.py [N] [reps]
Prints one JSON line per backend.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def main():
    import jax
    import jax.numpy as jnp
    from saro_gs_tpu.ops import mip

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    c, h, w = 32, 128, 128       # one hexplane space-space plane
    max_level = 7                # spatio plane setting (hexplane.py:49-56)

    rng = np.random.RandomState(0)
    grid = jnp.asarray(rng.normal(0, 0.1, (c, h, w)), jnp.float32)
    coords = jnp.asarray(rng.rand(n, 2), jnp.float32)
    level = jnp.asarray(rng.rand(n) * 3.0, jnp.float32)
    dfeat_seed = jnp.asarray(rng.normal(0, 1, (n, c)), jnp.float32)

    results = {}
    for backend in ("xla", "pallas"):
        os.environ["SARO_GRID_SCATTER"] = backend

        @jax.jit
        def grad_fn(grid, coords, level, dfeat_seed):
            def loss(g):
                out = mip.sample_mip(g, coords, level, max_level)
                return jnp.sum(out * dfeat_seed)
            return jax.grad(loss)(grid)

        g = grad_fn(grid, coords, level, dfeat_seed)
        jax.block_until_ready(g)
        t0 = time.time()
        for _ in range(reps):
            g = grad_fn(grid, coords, level, dfeat_seed)
        jax.block_until_ready(g)
        dt = (time.time() - t0) / reps * 1000
        results[backend] = {"ms": round(dt, 3), "grad_sum": float(
            jnp.sum(jnp.abs(g)))}
        print(json.dumps({"backend": backend, "n": n, **results[backend]}),
              flush=True)

    a = results["xla"]["grad_sum"]
    b = results["pallas"]["grad_sum"]
    print(json.dumps({"metric": "grid_scatter_agreement",
                      "rel_diff": abs(a - b) / max(abs(a), 1e-9)}),
          flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
