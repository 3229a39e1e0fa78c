"""Real-TPU Pallas parity harness: compiled Mosaic vs the pure-JAX oracle.

The CPU test suite exercises the Pallas kernels in INTERPRET mode only
(ops/tile_kernels._interpret); this script runs the same forward+backward
parity checks with compiled Mosaic kernels on the actual chip, over the
full flag matrix (prefix x packed x expander x tight_rect, plus strip
mode), and writes a re-runnable JSON artifact.

Usage: python scripts/parity_tpu.py [out.json] [--resume]
  (out defaults to PARITY_TPU.json; --resume skips combos already
  recorded ok in the existing artifact — each costs ~8 min of remote
  compile, so a killed run resumes where it stopped)
Exit code 0 iff every combination passes its gate.
"""
import itertools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    import jax
    import jax.numpy as jnp
    from saro_gs_tpu.ops.rasterize import RasterConfig, rasterize
    from tests.scene_fixtures import make_camera, make_gaussians

    argv = [a for a in sys.argv[1:] if a != "--resume"]
    resume = "--resume" in sys.argv[1:]
    out_path = argv[0] if argv else "PARITY_TPU.json"
    prev = {}
    if resume and os.path.exists(out_path):
        with open(out_path) as f:
            for c in json.load(f).get("combos", []):
                # only reuse combos that PASSED — a failed combo must be
                # re-tested so a resumed run can clear it
                if c.get("ok"):
                    prev[(c["prefix"], c["packed"], c["expander"],
                          c["tight_rect"])] = c
    on_tpu = jax.default_backend() == "tpu"
    w, h, n = (512, 384, 4000) if on_tpu else (128, 96, 300)
    chunk = 128  # Mosaic lane alignment requires 128-multiples on TPU
    rng = np.random.RandomState(666)
    cam, _ = make_camera(width=w, height=h)
    means, scales, quats, opac, shs = make_gaussians(rng, n=n)
    opac[::5] = 0.02           # exercise tight-rect shrinkage
    bg = jnp.asarray([0.1, 0.25, 0.05])
    args = tuple(map(jnp.asarray, (means, scales, quats, opac, shs)))
    d_color = jnp.asarray(rng.normal(0, 1, (3, h, w)).astype(np.float32))

    # capacities sized to the scene with NO truncation (the r3 harness bug:
    # at 1<<17 the 16x16 oracle dropped 76% of its 541k instances and every
    # combo "failed" against a truncated oracle); run() asserts no drops
    base = dict(tile_x=32, tile_y=32, chunk=chunk, max_instances=1 << 18,
                max_slots=1024)
    oracle_cfg = RasterConfig(tile_x=16, tile_y=16, chunk=64,
                              max_instances=1 << 20, max_slots=2048,
                              backend="jax", tight_rect=False)

    def run(cfg, row0=None):
        def loss(m, s, q, o, sh_):
            out = rasterize(m, s, q, o, cam, bg, width=w, height=h,
                            sh_degree=3, config=cfg, shs=sh_, row0=row0)
            dc = d_color
            if cfg.strip_rows:
                r0 = int(row0) * cfg.tile_y
                dc = d_color[:, r0:r0 + cfg.strip_rows * cfg.tile_y, :]
                hh = dc.shape[1]
                return jnp.sum(out.color[:, :hh] * dc)
            return jnp.sum(out.color * dc)

        fwd = jax.jit(lambda *a: rasterize(
            *a[:4], cam, bg, width=w, height=h, sh_degree=3, config=cfg,
            shs=a[4], row0=row0))(*args)
        assert int(fwd.num_dropped) == 0, (
            f"instance capacity too small: {int(fwd.num_dropped)} dropped "
            f"at max_instances={cfg.max_instances}")
        grads = jax.jit(jax.grad(loss, argnums=tuple(range(5))))(*args)
        return fwd, grads

    ref_fwd, ref_grads = run(oracle_cfg)
    ref_color = np.asarray(ref_fwd.color)

    results = {"device": str(jax.devices()[0]), "compiled_mosaic": on_tpu,
               "width": w, "height": h, "n_gaussians": n, "combos": []}
    ok_all = True
    names = ["means", "scales", "quats", "opac", "shs"]

    # production flags FIRST (matmul + packed + pallas + tight is what the
    # shipping configs train and bench with) so a partial artifact always
    # covers the combos that matter most
    for prefix, packed, expander, tight in itertools.product(
            ("matmul", "roll"), (True, False), ("pallas", "sort"),
            (True, False)):
        if (prefix, packed, expander, tight) in prev:
            combo = prev[(prefix, packed, expander, tight)]
            results["combos"].append(combo)
            ok_all &= combo["ok"]
            print("resume: " + json.dumps(combo), flush=True)
            continue
        cfg = RasterConfig(backend="pallas", prefix=prefix, packed=packed,
                           expander=expander, tight_rect=tight, **base)
        fwd, grads = run(cfg)
        color = np.asarray(fwd.color)
        c_psnr = psnr(np.clip(color, 0, 1), np.clip(ref_color, 0, 1))
        c_err = float(np.abs(color - ref_color).max())
        g_errs = {}
        for g, r, name in zip(grads, ref_grads, names):
            g, r = np.asarray(g), np.asarray(r)
            g_errs[name] = float(np.abs(g - r).max() /
                                 (np.abs(r).max() + 1e-8))
        depth_match = float(np.isclose(np.asarray(fwd.depth),
                                       np.asarray(ref_fwd.depth)).mean())
        # fraction of pixels disagreeing visibly (diagnostic, recorded).
        # Compiled-vs-oracle roll-mode error comes from two benign
        # sources: (1) Mosaic's exp/transcendental approximations differ
        # slightly from XLA's, and the per-contributor noise random-walks
        # along the transmittance chain — so the error scales with a
        # pixel's contributor DEPTH (the ~1% tail is the dense pixels,
        # identical across tight_rect variants); (2) borderline
        # contributors flip the alpha >= 1/255 inclusion test, each
        # bounded by ~1/255.  Max error stays a few quanta (measured
        # 0.0085 ~ 2/255 at 71.7 dB); a systematic compositing bug shows
        # neither the depth correlation nor the bound.
        err_frac = float((np.abs(color - ref_color).max(axis=0)
                          > 1e-3).mean())
        # gates by precision mode: packed quantizes six attrs to bf16
        # (visually lossless, >45 dB); compiled matmul-prefix quantizes
        # the log-transmittance matmul inputs to bf16 (Mosaic DEFAULT,
        # ~1e-3 T error by design); compiled roll is exact arithmetic but
        # its exp/alpha thresholds still tie-flip a handful of
        # instance-pixel pairs vs the XLA oracle, and a flipped
        # contributor shifts its own grads by a few % — so the TPU gate
        # is flip-structured (high PSNR + color error bounded by a few
        # inclusion quanta), while CPU interpret mode (identical
        # arithmetic) stays strict.  The 0.05 grad bound is required in
        # EVERY compiled mode, not just roll: measured max grad relerr
        # (always on quats, the longest vjp chain) is 0.0345 matmul
        # unpacked, 0.0394 matmul packed, 0.0331/0.0395 roll
        # unpacked/packed (PARITY_TPU.json, v5e).  err_frac_1e3 is
        # recorded as a DIAGNOSTIC only — compiled transcendentals give
        # it ~0.01 (roll) to ~0.26 (packed matmul), so it is never
        # gated on-TPU
        if packed:
            ok = c_psnr > 45.0 and all(v < 0.05 for v in g_errs.values())
        elif prefix == "matmul" and on_tpu:
            # bf16 log-T matmul: ~1e-3 T error on EVERY pixel by design,
            # so err_frac is not meaningful here
            ok = c_psnr > 55.0 and all(v < 0.05 for v in g_errs.values()) \
                and depth_match > 0.995
        elif on_tpu:
            # flip-structured gate: high PSNR + max error bounded by a
            # few 1/255 inclusion quanta (4/255), grads within the few-%
            # perturbation a flipped contributor carries
            ok = c_psnr > 60.0 and c_err < 4.0 / 255.0 \
                and all(v < 0.05 for v in g_errs.values()) \
                and depth_match > 0.995
        else:
            ok = c_err < 1e-3 and all(v < 5e-3 for v in g_errs.values()) \
                and depth_match > 0.995
        combo = {"prefix": prefix, "packed": packed, "expander": expander,
                 "tight_rect": tight, "color_maxerr": c_err,
                 "err_frac_1e3": err_frac,
                 "color_psnr_db": round(c_psnr, 2),
                 "grad_relerr": {k: round(v, 6) for k, v in g_errs.items()},
                 "depth_match": round(depth_match, 5), "ok": bool(ok)}
        results["combos"].append(combo)
        ok_all &= ok
        print(json.dumps(combo), flush=True)
        # incremental dump: a driver/timeout kill mid-matrix must not
        # lose the combos already measured (each costs ~8 min of remote
        # compile); partial artifacts carry ok=false until the end
        results["ok"] = False
        results["partial"] = True
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    # alpha_matmul on the SHIPPING combo (matmul+packed+pallas+tight):
    # the [K,6]@[6,P] quadratic contraction vs the oracle, packed-mode
    # gates (alpha_matmul adds only threshold tie-flips on top of the
    # bf16 attr quantization; see tile_kernels._chunk_alpha_mm)
    cfg = RasterConfig(backend="pallas", prefix="matmul", packed=True,
                       expander="pallas", tight_rect=True,
                       alpha_matmul=True, **base)
    fwd, grads = run(cfg)
    color = np.asarray(fwd.color)
    am_psnr = psnr(np.clip(color, 0, 1), np.clip(ref_color, 0, 1))
    am_gerr = {}
    for g, r, name in zip(grads, ref_grads, names):
        g, r = np.asarray(g), np.asarray(r)
        am_gerr[name] = float(np.abs(g - r).max() / (np.abs(r).max() + 1e-8))
    am_ok = am_psnr > 45.0 and all(v < 0.05 for v in am_gerr.values())
    results["alpha_matmul"] = {
        "color_psnr_db": round(am_psnr, 2),
        "color_maxerr": float(np.abs(color - ref_color).max()),
        "grad_relerr": {k: round(v, 6) for k, v in am_gerr.items()},
        "ok": bool(am_ok)}
    ok_all &= am_ok
    print(json.dumps({"alpha_matmul": results["alpha_matmul"]}), flush=True)
    results["ok"] = False
    results["partial"] = True
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)

    # strip mode: 2 strips on the fast flags reassemble + grads sum
    cfg = RasterConfig(backend="pallas", prefix="matmul", packed=False,
                       expander="pallas", tight_rect=True, **base)
    grid_y = (h + cfg.tile_y - 1) // cfg.tile_y
    rows = (grid_y + 1) // 2
    scfg = cfg._replace(strip_rows=rows)
    full_fwd, full_grads = run(cfg)
    parts, gsum = [], None
    for s in range(2):
        f, g = run(scfg, row0=jnp.float32(s * rows))
        parts.append(np.asarray(f.color))
        gsum = g if gsum is None else jax.tree_util.tree_map(
            jnp.add, gsum, g)
    strip_color = np.concatenate(parts, axis=1)[:, :h, :]
    s_err = float(np.abs(strip_color - np.asarray(full_fwd.color)).max())
    sg_err = max(float(np.abs(np.asarray(a) - np.asarray(b)).max() /
                       (np.abs(np.asarray(b)).max() + 1e-8))
                 for a, b in zip(gsum, full_grads))
    # strip-vs-full gate by precision mode: a row-offset bug shows O(1)
    # misplacement error, so the gate only needs to sit above the
    # compiled noise floor.  In compiled matmul-prefix mode the strip
    # run bins instances per strip — different chunk boundaries feed the
    # bf16 log-transmittance matmul different roundings (measured
    # 4.5e-4 color / 0.23% grads on v5e, ~1/8 of a 1/255 quantum);
    # CPU interpret is exact arithmetic and stays strict
    if on_tpu:
        strip_ok = s_err < 2e-3 and sg_err < 1e-2
    else:
        strip_ok = s_err < 1e-4 and sg_err < 2e-3
    results["strip"] = {"color_maxerr": s_err, "grad_relerr": sg_err,
                        "ok": bool(strip_ok)}
    ok_all &= strip_ok
    results["ok"] = bool(ok_all)
    results.pop("partial", None)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"parity {'OK' if ok_all else 'FAILED'} -> {out_path}",
          flush=True)
    os._exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
