"""Stage-by-stage TPU timing of the render pipeline at bench settings.

Times (jitted separately, block_until_ready):
  1. deformation (field + MLPs)
  2. preprocess (project/cov2d/SH)
  3. binning (instance expansion + sort + ranges)
  4. forward compositing (pallas)
  5. full test_render
Prints one JSON line per stage.
"""
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=8, name=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    if name:
        print(json.dumps({name: round(dt * 1000, 2)}), flush=True)
    return dt


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    stages = sys.argv[1].split(",") if len(sys.argv) > 1 else None

    def want(name):
        return stages is None or name in stages
    from __graft_entry__ import _camera, _synthetic_state
    from saro_gs_tpu.models import gaussians as gm
    from saro_gs_tpu.ops import binning, projection
    from saro_gs_tpu.ops.rasterize import RasterConfig, rasterize
    from saro_gs_tpu.render import test_render

    width, height = 1352, 1014
    n = 200_000
    cfg, params, nets, alive, fstatic = _synthetic_state(n=n, capacity=n,
                                                         seed=3)
    rng = np.random.RandomState(0)
    params = params._replace(
        scaling=jnp.asarray(np.log(rng.uniform(0.003, 0.02, (n, 3))),
                            jnp.float32))
    cam = _camera(width, height)
    rcfg = RasterConfig(tile_x=32, tile_y=32, chunk=128,
                        max_instances=1 << 21, backend="pallas",
                        max_slots=512)
    bg = jnp.zeros(3)
    results = {}

    feat = jax.jit(gm.field_feat, static_argnames=("cfg",))(
        params, nets, cfg, fstatic)

    # 1. deformation
    @jax.jit
    def deform(ts, feat):
        return gm.deform(params, nets, cfg, fstatic, jnp.float32(ts),
                         feat=feat)
    if want("deform"):
        results["deform"] = timeit(deform, 0.4, feat, name="deform")

    dyn = deform(0.4, feat)
    means3d, scales, quats, opac, shs = (
        dyn.xyz, dyn.scaling, dyn.rotation, dyn.opacity.reshape(-1), dyn.shs)

    # 2. preprocess
    @jax.jit
    def pre_fn():
        return projection.preprocess(
            means3d, scales, quats, opac, cam, width, height,
            rcfg.tile_x, rcfg.tile_y, sh_degree=3, shs=shs,
            colors_precomp=None, active=alive)
    if want("preprocess"):
        results["preprocess"] = timeit(pre_fn, name="pre_fn")
    pre = pre_fn()

    grid_x = (width + rcfg.tile_x - 1) // rcfg.tile_x
    grid_y = (height + rcfg.tile_y - 1) // rcfg.tile_y

    # 3. binning
    @jax.jit
    def bin_fn():
        return binning.bin_gaussians(pre, grid_x, grid_y,
                                     rcfg.max_instances, rcfg.chunk)
    if want("binning"):
        results["binning"] = timeit(bin_fn, name="bin_fn")
    bins = bin_fn()
    results["num_instances"] = int(np.asarray(
        bins.tile_count).sum())
    results["num_dropped"] = int(np.asarray(bins.num_dropped))

    # 4. forward compositing only
    from saro_gs_tpu.ops import tile_kernels

    @jax.jit
    def comp_fn():
        return tile_kernels.forward_tiles_pallas(
            bins.point_list, bins.tile_start, bins.tile_count,
            pre.mean2d, pre.conic, opac.reshape(-1), pre.rgb, pre.depth,
            bg, width, height, rcfg.tile_x, rcfg.tile_y, rcfg.chunk)
    if want("compositing"):
        results["compositing"] = timeit(comp_fn, name="comp_fn")

    # 5. full eval render
    @jax.jit
    def full(ts, feat):
        out, _ = test_render(cam, ts, params, nets, alive, cfg, fstatic, bg,
                             width=width, height=height, sh_degree=3,
                             rcfg=rcfg, feat=feat)
        return out.color
    if want("full"):
        results["full_render"] = timeit(full, jnp.float32(0.4), feat,
                                        name="full")

    # same program but returning one scalar: isolates device compute from
    # any per-frame image readback the platform tunnel may do
    @jax.jit
    def full_scalar(ts, feat):
        out, _ = test_render(cam, ts, params, nets, alive, cfg, fstatic, bg,
                             width=width, height=height, sh_degree=3,
                             rcfg=rcfg, feat=feat)
        return out.color.sum()
    if want("full_scalar"):
        results["full_scalar"] = timeit(full_scalar, jnp.float32(0.4), feat,
                                        name="full_scalar")

    # successive truncation with REAL traced args (immune to constant
    # folding): t(bin) = trunc2 - trunc1, t(comp+glue) = full - trunc2
    if want("trunc"):
        def build(upto):
            @jax.jit
            def fn(ts, feat):
                d = gm.deform(params, nets, cfg, fstatic, ts, feat=feat)
                o = d.opacity.reshape(-1)
                pre_ = projection.preprocess(
                    means3d=d.xyz, scales=d.scaling, quats=d.rotation,
                    opacities=o, cam=cam, width=width, height=height,
                    tile_x=rcfg.tile_x, tile_y=rcfg.tile_y, sh_degree=3,
                    shs=d.shs, colors_precomp=None, active=alive)
                if upto == 1:
                    return jax.tree_util.tree_map(jnp.sum, pre_)
                bins_ = binning.bin_gaussians(pre_, grid_x, grid_y,
                                              rcfg.max_instances, rcfg.chunk)
                return (jnp.sum(bins_.point_list),
                        jnp.sum(bins_.tile_start))
            return fn
        timeit(build(1), jnp.float32(0.4), feat, name="trunc1_pre")
        timeit(build(2), jnp.float32(0.4), feat, name="trunc2_bin")

    # chained dispatch: the four already-compiled stage programs called
    # back-to-back per frame (python chaining, no fusion)
    if want("chained"):
        from saro_gs_tpu.ops import tile_kernels

        @jax.jit
        def pre2(means3d, scales, quats, opac, shs):
            return projection.preprocess(
                means3d, scales, quats, opac, cam, width, height,
                rcfg.tile_x, rcfg.tile_y, sh_degree=3, shs=shs,
                colors_precomp=None, active=alive)

        @jax.jit
        def bin2(pre):
            return binning.bin_gaussians(pre, grid_x, grid_y,
                                         rcfg.max_instances, rcfg.chunk)

        @jax.jit
        def comp2(bins, pre, opac):
            return tile_kernels.forward_tiles_pallas(
                bins.point_list, bins.tile_start, bins.tile_count,
                pre.mean2d, pre.conic, opac, pre.rgb, pre.depth,
                bg, width, height, rcfg.tile_x, rcfg.tile_y, rcfg.chunk)

        def frame(ts, feat):
            d = deform(ts, feat)
            o = d.opacity.reshape(-1)
            p = pre2(d.xyz, d.scaling, d.rotation, o, d.shs)
            b = bin2(p)
            return comp2(b, p, o)
        # per-stage with REAL (argument-passed) programs — the no-arg
        # closures above constant-fold and time only output copies
        d = deform(jnp.float32(0.4), feat)
        o = jax.jit(lambda x: x.reshape(-1))(d.opacity)
        timeit(deform, jnp.float32(0.4), feat, name="s_deform")
        timeit(pre2, d.xyz, d.scaling, d.rotation, o, d.shs, name="s_pre")
        p = pre2(d.xyz, d.scaling, d.rotation, o, d.shs)
        timeit(bin2, p, name="s_bin")
        b = bin2(p)
        timeit(comp2, b, p, o, name="s_comp")
        results["chained"] = timeit(frame, 0.4, feat, name="chained")

    for k, v in results.items():
        if isinstance(v, float):
            results[k] = round(v * 1000, 2)
    print(json.dumps(results), flush=True)
    os._exit(0)
