"""Dump the backward compositor's per-instance gradient table [16, MI] at
a known-bad (camera, timestamp) and locate the non-finite rows/instances
+ their staged attributes.

Usage: python scripts/nan_kernel_probe.py <cfg> <scene> <ckpt.ply> <cam> <ts>
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def main():
    import jax
    import jax.numpy as jnp
    from saro_gs_tpu.config import load_config
    from saro_gs_tpu.scene import Scene
    from saro_gs_tpu.models import gaussians as gm
    from saro_gs_tpu.ops import rasterize as rz
    from saro_gs_tpu.ops import tile_kernels
    from saro_gs_tpu.train import losses

    cfg_path, scene_dir, ckpt, cam_name, ts_s = sys.argv[1:6]
    ts = jnp.float32(float(ts_s))
    cfg = load_config(cfg_path, source_path=scene_dir,
                      model_path="/tmp/nan_probe_out")
    os.makedirs(cfg.model_path, exist_ok=True)
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
    statics = (w, h, cfg.sh_degree, rcfg)

    @jax.jit
    def run(params, nets, ts):
        feat = gm.field_feat(params, nets, mcfg, scene.fstatic)
        d = gm.deform(params, nets, mcfg, scene.fstatic, ts, feat=feat)
        pre, bins, fwd = rz._forward(
            statics, d.xyz, d.scaling, d.rotation,
            d.opacity.reshape(-1), d.shs, None, raster, bg, alive, None)

        def loss_of(color):
            img = jnp.clip(color, 0.0, 1.0)
            lam = cfg.lambda_dssim
            return ((1 - lam) * jnp.abs(img - gt).mean()
                    + lam * (1.0 - losses.ssim(img, gt)))

        d_color = jax.grad(loss_of)(fwd.color)
        g16 = tile_kernels.backward_tiles_pallas(
            bins, bg, fwd.color, fwd.final_t, d_color,
            w, h, rcfg.tile_x, rcfg.tile_y, rcfg.chunk,
            n_contrib=fwd.n_contrib, prefix=rcfg.prefix,
            alpha_matmul=rcfg.alpha_matmul)
        return (g16, bins.ids, bins.attr, bins.tile_start, bins.tile_count,
                jnp.isfinite(d_color).all(), bins.num_instances)

    g16, ids, attr, tstart, tcount, dcol_ok, n_inst = run(params, nets, ts)
    g16 = np.asarray(g16)
    ids = np.asarray(ids)
    attr = np.asarray(attr)
    print("d_color finite:", bool(dcol_ok), " instances:", int(n_inst))
    bad = ~np.isfinite(g16).all(axis=0)
    print("bad instance slots:", int(bad.sum()), "of", g16.shape[1])
    rows_bad = [r for r in range(16) if not np.isfinite(g16[r]).all()]
    print("non-finite rows:", rows_bad,
          "(0-2 rgb, 3-4 mean, 5-7 conic, 8 op)")
    idx = np.where(bad)[0][:12]
    np.set_printoptions(precision=4, suppress=False, linewidth=120)
    ts_, tc = np.asarray(tstart), np.asarray(tcount)
    for i in idx:
        tile = int(np.searchsorted(ts_, i, side="right") - 1)
        print(f"slot {i} gid {ids[i]} tile {tile} "
              f"(start {ts_[tile]} count {tc[tile]})")
        print("  attr x,y,ca,cb,cc,op,r,g,b,d:", attr[:10, i])
        print("  g16:", g16[:9, i])
    # conic PD check for bad slots
    ca, cb, cc = attr[2], attr[3], attr[4]
    indef = (ca * cc - cb * cb) < 0
    print("indefinite-conic instances overall:", int(indef[:int(n_inst)].sum()))
    print("bad & indefinite:", int((bad & indef).sum()))


if __name__ == "__main__":
    main()
