"""Trace one TPU training step and print top device ops (see trace_tpu.py)."""
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _camera, _synthetic_state
    from saro_gs_tpu.models import densify as dens
    from saro_gs_tpu.ops.rasterize import RasterConfig
    from saro_gs_tpu.train import optim
    from saro_gs_tpu.train import step as step_mod
    from saro_gs_tpu.train.losses import LossWeights
    from saro_gs_tpu.train.trainer import TrainState

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_train"
    width, height, n, batch = 1352, 1014, 200_000, 4
    cfg, params, nets, alive, fstatic = _synthetic_state(n=n, capacity=n,
                                                         seed=3)
    rng = np.random.RandomState(0)
    params = params._replace(
        scaling=jnp.asarray(np.log(rng.uniform(0.003, 0.02, (n, 3))),
                            jnp.float32))
    cam = _camera(width, height)
    rcfg = RasterConfig(tile_x=32, tile_y=32, chunk=128,
                        max_instances=576 * 1024, backend="pallas",
                        max_slots=128, prefix="matmul", packed=True,
                        expander="pallas")
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
    cams = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x),
                                   (batch,) + jnp.asarray(x).shape), cam)
    gt = jnp.zeros((batch, 3, height, width))
    ts = jnp.linspace(0.1, 0.9, batch).reshape(-1, 1, 1)

    @jax.jit
    def train_step(state, gt, ts):
        return step_mod.train_step_core(
            state, cams, gt, ts, jnp.zeros(3), fstatic, st,
            stage="dynamatic", sh_degree=3, scale_integral=True)

    state, _ = train_step(state, gt, ts)
    jax.block_until_ready(state.points.xyz)
    print("compiled; tracing...", flush=True)
    with jax.profiler.trace(outdir):
        state, _ = train_step(state, gt, ts)
        jax.block_until_ready(state.points.xyz)
    print("trace done", flush=True)

    planes = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([planes[-1]], "framework_op_stats", {})
    text = data.decode() if isinstance(data, bytes) else data
    print(text[:9000], flush=True)
    os._exit(0)
