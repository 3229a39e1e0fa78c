"""Bisect the residual non-finite-gradient source at a known-bad
(camera, timestamp) pair from nan_sweep.py.

Stages:
  A: deform outputs finite?
  B: image-loss grads wrt the RASTERIZER INPUTS (deform outputs as
     leaves) — isolates the rasterize custom_vjp.
  C: deform vjp with stage-B cotangents, injected one output at a time —
     isolates which deform-output chain manufactures the NaN.

Usage: python scripts/nan_bisect.py <cfg> <scene> <ckpt.ply> <cam> <ts>
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def finite_tree(tree):
    import jax
    import jax.numpy as jnp
    return {i: bool(jnp.isfinite(leaf).all())
            for i, leaf in enumerate(jax.tree_util.tree_leaves(tree))}


def main():
    import jax
    import jax.numpy as jnp
    from saro_gs_tpu.config import load_config
    from saro_gs_tpu.scene import Scene
    from saro_gs_tpu.models import gaussians as gm
    from saro_gs_tpu.ops.rasterize import rasterize
    from saro_gs_tpu.render import train_render
    from saro_gs_tpu.train import losses

    cfg_path, scene_dir, ckpt, cam_name, ts_s = sys.argv[1:6]
    ts = jnp.float32(float(ts_s))
    cfg = load_config(cfg_path, source_path=scene_dir,
                      model_path="/tmp/nan_bisect_out")
    os.makedirs(cfg.model_path, exist_ok=True)
    np.random.seed(cfg.seed)
    scene = Scene(cfg)
    scene.load_checkpoint(ckpt)
    mcfg = cfg.model_config()
    rcfg = cfg.raster_config()._replace(max_instances=917504)
    params, nets, alive = scene.params, scene.nets, scene.alive
    cam = next(c for c in scene.info.train_cameras
               if getattr(c, "image_name", "") == cam_name)
    raster = cam.raster_params()
    gt = jnp.asarray(cam.load_image(cfg.white_background))
    bg = jnp.ones(3) if cfg.white_background else jnp.zeros(3)
    w, h = cam.width, cam.height
    lam = cfg.lambda_dssim

    @jax.jit
    def stageA(params, nets, ts):
        feat = gm.field_feat(params, nets, mcfg, scene.fstatic)
        d = gm.deform(params, nets, mcfg, scene.fstatic, ts, feat=feat)
        return jax.tree_util.tree_map(
            lambda x: jnp.isfinite(x).all(), d), d

    finA, d = stageA(params, nets, ts)
    print("A deform finite:", {f: bool(v) for f, v in
                               zip(d._fields, jax.tree_util.tree_leaves(
                                   finA))}, flush=True)

    def img_loss(xyz, scaling, rotation, opacity, shs):
        out = rasterize(xyz, scaling, rotation, opacity.reshape(-1),
                        raster, bg, width=w, height=h,
                        sh_degree=cfg.sh_degree, config=rcfg, shs=shs,
                        active=alive)
        img = jnp.clip(out.color, 0.0, 1.0)
        ll1 = jnp.abs(img - gt).mean()
        return (1.0 - lam) * ll1 + lam * (1.0 - losses.ssim(img, gt))

    gradB = jax.jit(jax.grad(img_loss, argnums=(0, 1, 2, 3, 4)))
    gB = gradB(d.xyz, d.scaling, d.rotation, d.opacity, d.shs)
    names = ["xyz", "scaling", "rotation", "opacity", "shs"]
    finB = {n: bool(jnp.isfinite(g).all()) for n, g in zip(names, gB)}
    print("B rasterize-input grads finite:", finB, flush=True)

    # stage C: push each cotangent through deform separately
    def deform_outs(params, nets):
        feat = gm.field_feat(params, nets, mcfg, scene.fstatic)
        dd = gm.deform(params, nets, mcfg, scene.fstatic, ts, feat=feat)
        return (dd.xyz, dd.scaling, dd.rotation, dd.opacity, dd.shs)

    for i, n in enumerate(names):
        cots = tuple(jnp.where(jnp.isfinite(g), g, 0.0) if j == i
                     else jnp.zeros_like(g)
                     for j, g in enumerate(gB))

        @jax.jit
        def gr(params, nets, cots=cots):
            _, vjp = jax.vjp(deform_outs, params, nets)
            return vjp(cots)

        gp, gn = gr(params, nets)
        fp = finite_tree(gp)
        fn_ = finite_tree(gn)
        badp = [k for k, v in zip(gm.GaussianParams._fields, fp.values())
                if not v]
        badn = [k for k, v in fn_.items() if not v]
        print(f"C cotangent[{n}] -> bad params {badp} "
              f"bad net leaves {len(badn)}", flush=True)


if __name__ == "__main__":
    main()
