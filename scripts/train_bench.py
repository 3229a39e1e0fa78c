"""Training-step throughput on the real chip at flame_steak scale.

One jitted train_step_core (batch of views, dynamic stage, full backward +
per-Gaussian-LR Adam) timed with per-pass sync.  Prints one JSON line:
{"metric": "train_step_..", "value": steps/s, ...}
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        import jax._src.xla_bridge as _xb
        _xb._backend_factories.pop("axon", None)
    import jax.numpy as jnp
    from __graft_entry__ import _camera, _synthetic_state
    from saro_gs_tpu.models import densify as dens
    from saro_gs_tpu.ops.rasterize import RasterConfig
    from saro_gs_tpu.train import optim
    from saro_gs_tpu.train import step as step_mod
    from saro_gs_tpu.train.losses import LossWeights
    from saro_gs_tpu.train.trainer import TrainState

    on_tpu = jax.default_backend() == "tpu"
    width, height = (1352, 1014) if on_tpu else (96, 64)
    n = 200_000 if on_tpu else 500
    batch = int(os.environ.get("TRAIN_BENCH_BATCH", "4" if on_tpu else "2"))
    cfg, params, nets, alive, fstatic = _synthetic_state(n=n, capacity=n,
                                                         seed=3)
    rng = np.random.RandomState(0)
    params = params._replace(
        scaling=jnp.asarray(np.log(rng.uniform(0.003, 0.02, (n, 3))),
                            jnp.float32))
    cam = _camera(width, height)
    rcfg = RasterConfig(tile_x=32, tile_y=32,
                        chunk=int(os.environ.get("SARO_BENCH_CHUNK", "128")),
                        max_instances=576 * 1024 if on_tpu else 1 << 14,
                        backend="pallas" if on_tpu else "jax",
                        max_slots=128,
                        prefix=os.environ.get("SARO_BENCH_PREFIX", "matmul"),
                        packed=os.environ.get("SARO_BENCH_PACKED",
                                              "1") == "1",
                        expander=os.environ.get("SARO_BENCH_EXPAND",
                                                "pallas"))
    st = step_mod.StepStatics(
        mcfg=cfg, rcfg=rcfg, weights=LossWeights(lambda_dssim=0.2),
        width=width, height=height,
        cfg_lrs=(1.6e-4, 1.6e-6, 0.01, 30000, 0.0025, 0.05, 0.005, 0.001,
                 1e-4, 1.6e-4, 1.6e-7, 3.2e-3, 3.2e-6),
        extent=1.0)
    state = TrainState(
        points=params, nets=nets,
        opt=optim.init_adam({"points": params, "nets": nets}),
        alive=alive, aux=dens.init_aux(n),
        inv_integral=jnp.ones((n, 1)),
        inv_integral_densify=jnp.ones((n, 1)),
        step=jnp.zeros((), jnp.int32))
    print("state built", flush=True)
    cams = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (batch,) + jnp.asarray(x).shape), cam)
    gt = jnp.zeros((batch, 3, height, width))
    ts = jnp.linspace(0.1, 0.9, batch).reshape(-1, 1, 1)

    @jax.jit
    def train_step(state, gt, ts):
        return step_mod.train_step_core(
            state, cams, gt, ts, jnp.zeros(3), fstatic, st,
            stage="dynamatic", sh_degree=3, scale_integral=True)

    print("tracing...", flush=True)
    state, metrics = train_step(state, gt, ts)
    jax.block_until_ready(state.points.xyz)
    print("compiled", flush=True)

    reps = 20 if on_tpu else 3
    t0 = time.time()
    for _ in range(reps):
        state, metrics = train_step(state, gt, ts)
    jax.block_until_ready(state.points.xyz)
    dt = (time.time() - t0) / reps
    print(json.dumps({
        "metric": f"train_step_b{batch}_{width}x{height}",
        "value": round(1.0 / dt, 3),
        "unit": "steps/s",
        "ms_per_step": round(dt * 1000, 1),
        "loss": float(metrics["loss"]),
    }), flush=True)
    os._exit(0)
