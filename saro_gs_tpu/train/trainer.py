"""Training driver (L4): jitted train step + host-side density control.

Re-design of train.py:56-303.  The per-iteration work — a batch of view
renders, loss, gradients, densify-stat merge, LR schedules and the Adam
update — is ONE jitted function (`lax.map` over the view batch mirrors the
reference's sequential gradient accumulation exactly: mean of per-view
gradients, train.py:190-226).  Host-side control handles what the reference
also does outside autograd: stage switching, the every-50-iteration integral
prune/LR refresh, densify/prune/opacity-reset scheduling
(helper_train.controlgaussians:103-174), SH-degree ramping, eval and
checkpointing.  Capacity overflow triggers an automatic grow + re-jit.
"""
from __future__ import annotations

import functools
import json
import os
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import densify as dens
from ..models import gaussians as gm
from ..models import mlp as mlp_mod
from ..ops.projection import CameraParams
from ..render import train_render
from ..scene import Scene
from . import losses, optim, step


class TrainState(NamedTuple):
    points: gm.GaussianParams
    nets: gm.NetParams
    opt: optim.AdamState           # over {"points":..., "nets":...}
    alive: jnp.ndarray             # [C]
    aux: dens.DensifyAux
    inv_integral: jnp.ndarray      # [C, 1] LR scaling (refreshed / 50 it)
    inv_integral_densify: jnp.ndarray  # [C, 1]
    step: jnp.ndarray              # int32
    # health counters accumulated in-graph so the host can read them on a
    # stride without missing events between reads (np defaults keep older
    # constructors working and avoid device work at class-def time)
    dropped_hwm: jnp.ndarray = np.int32(0)  # max dropped since last read
    bad_steps: jnp.ndarray = np.int32(0)    # cumulative non-finite steps


def dataclasses_dict(cfg) -> dict:
    import dataclasses as _dc
    return {f.name: getattr(cfg, f.name) for f in _dc.fields(cfg)
            if isinstance(getattr(cfg, f.name),
                          (int, float, str, bool, list, tuple))}


class Trainer:
    def __init__(self, cfg: Config, scene: Scene):
        self.cfg = cfg
        self.scene = scene
        self.mcfg = cfg.model_config()
        self.rcfg = cfg.raster_config()
        self.weights = cfg.loss_weights()
        cam0 = scene.info.train_cameras[0]
        self.width, self.height = cam0.width, cam0.height
        self.bg = jnp.asarray(
            [1.0, 1.0, 1.0] if cfg.white_background else [0.0, 0.0, 0.0],
            jnp.float32)
        self.active_sh_degree = 0
        self.best_psnr = 0.0
        self.key = jax.random.PRNGKey(cfg.seed)

        cap = scene.params.xyz.shape[0]
        opt_state = optim.init_adam({"points": scene.params,
                                     "nets": scene.nets})
        self.state = TrainState(
            points=scene.params, nets=scene.nets, opt=opt_state,
            alive=scene.alive, aux=dens.init_aux(cap),
            inv_integral=jnp.ones((cap, 1), jnp.float32),
            inv_integral_densify=jnp.ones((cap, 1), jnp.float32),
            step=jnp.zeros((), jnp.int32))
        self.history = []
        self._check_tile_divisibility()
        if cfg.presize_instances and scene.info.train_cameras:
            self._presize_instances()

    def _check_tile_divisibility(self):
        """The point-sharded hexplane sampling (step.py batch_loss_fn)
        silently falls back to fully-replicated field_feat when the
        capacity is not a multiple of mesh_tile; capacities are chosen
        host-side, so surface the static condition loudly."""
        n_tile = self.cfg.mesh_tile
        cap = self.state.alive.shape[0]
        if n_tile > 1 and cap % n_tile != 0:
            print(f"[warn] capacity {cap} not divisible by mesh_tile "
                  f"{n_tile}: hexplane sampling runs fully replicated "
                  f"(point-sharding speedup disabled)")

    def _presize_instances(self):
        """Right-size the instance capacity before the first train-step jit
        (mirrors the eval probe, eval.py:96-106).  A mid-run overflow
        doubles max_instances and re-jits — 10-30 min per compile through
        the TPU tunnel — so probe one frame now and leave densify headroom
        (overflow doubling remains as a fallback)."""
        cfg = self.cfg
        cam = self.scene.info.train_cameras[0]
        cp = cam.raster_params()
        st = self.state

        @jax.jit
        def probe(points, nets, alive, ts):
            pkg = train_render(cp, ts, points, nets, alive, self.mcfg,
                               self.scene.fstatic, self.bg,
                               width=self.width, height=self.height,
                               stage="static", sh_degree=0, rcfg=self.rcfg)
            return pkg.out.num_instances, pkg.out.num_dropped

        inst, dropped = probe(st.points, st.nets, st.alive,
                              jnp.float32(cam.timestamp))
        need = int(inst) + int(dropped)
        # snug multiple of 64k (NOT a power of two — the sort/scan cost
        # scales linearly with the capacity, so pow2 rounding can nearly
        # double the per-step cost for nothing)
        # floor at one 64k block: a zero-instance probe (first camera sees
        # nothing at its timestamp) must not set capacity 0, from which the
        # overflow doubling (0*2) could never recover
        cap = max(-(-int(need * cfg.presize_factor) // 65536) * 65536, 65536)
        if cap != self.rcfg.max_instances:
            print(f"[presize] probe {need} instances -> max_instances "
                  f"{self.rcfg.max_instances} -> {cap}")
            self.rcfg = self.rcfg._replace(max_instances=cap)

    # ------------------------------------------------------------------
    # jitted pieces
    # ------------------------------------------------------------------

    def _statics(self) -> step.StepStatics:
        return step.StepStatics(
            mcfg=self.mcfg, rcfg=self.rcfg, weights=self.weights,
            width=self.width, height=self.height,
            cfg_lrs=step.make_lr_statics(self.cfg),
            extent=self.scene.cameras_extent,
            scale_floor=self.cfg.scale_floor)

    @functools.partial(jax.jit, static_argnames=("self", "st", "stage"))
    def _train_step(self, state: TrainState, cams: CameraParams,
                    gt: jnp.ndarray, timestamps: jnp.ndarray,
                    sh_mask: jnp.ndarray, scale_integral: jnp.ndarray, *,
                    st: step.StepStatics, stage: str):
        # ``st`` is passed explicitly (not via self) so mutating
        # self.rcfg — e.g. instance-capacity growth — re-traces.
        # The SH ramp rides the traced ``sh_mask`` (NOT a static degree):
        # each degree change would otherwise be a full remote recompile.
        sh_degree = self.cfg.sh_degree
        if self.cfg.mesh_data > 1 or self.cfg.mesh_tile > 1:
            from ..parallel import shard
            return shard.dp_train_step(
                state, cams, gt, timestamps, self.bg, self.scene.fstatic,
                st, stage=stage, sh_degree=sh_degree, sh_mask=sh_mask,
                scale_integral=scale_integral, n_data=self.cfg.mesh_data,
                n_tile=self.cfg.mesh_tile)
        return step.train_step_core(
            state, cams, gt, timestamps, self.bg, self.scene.fstatic,
            st, stage=stage, sh_degree=sh_degree, sh_mask=sh_mask,
            scale_integral=scale_integral)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _integral_refresh(self, state: TrainState, use_integral):
        # use_integral is traced (0/1 scalar): it flips once mid-run at
        # densify_until_iter and must not trigger a remote recompile
        integral = gm.temporal_integral(state.points, state.nets, self.mcfg,
                                        self.scene.fstatic)
        alive, inv = dens.integral_prune_and_lr(state.alive, integral,
                                                self.mcfg.min_intergral,
                                                clip=self.cfg.inv_lr_clip)
        inv_lr = jnp.where(use_integral, inv, jnp.ones_like(inv))
        return state._replace(alive=alive, inv_integral=inv_lr,
                              inv_integral_densify=inv)

    @functools.partial(jax.jit,
                       static_argnames=("self", "with_size_threshold"))
    def _densify(self, state: TrainState, key, *,
                 with_size_threshold: bool):
        integral = gm.temporal_integral(state.points, state.nets, self.mcfg,
                                        self.scene.fstatic)
        res = dens.densify_pruneclone(
            state.points, state.opt.mu["points"], state.opt.nu["points"],
            state.alive, state.aux, key,
            grad_threshold=self.cfg.densify_grad_threshold,
            min_opacity=self.cfg.opthr,
            extent=self.scene.cameras_extent,
            percent_dense=self.cfg.percent_dense,
            max_screen_size=(self.cfg.max_screen_size
                             if with_size_threshold else None),
            inv_integral=state.inv_integral_densify,
            integral=integral,
            min_intergral=self.mcfg.min_intergral,
            prune_z=self.cfg.loader == "colmap",
            prune_big_ws=self.cfg.pw,
            min_scale_abs=self.cfg.prune_min_scale *
            self.scene.cameras_extent)
        opt = state.opt._replace(
            mu={"points": res.mu, "nets": state.opt.mu["nets"]},
            nu={"points": res.nu, "nets": state.opt.nu["nets"]})
        return state._replace(points=res.params, opt=opt, alive=res.alive,
                              aux=res.aux), res

    @functools.partial(jax.jit, static_argnames=("self",))
    def _reset_opacity(self, state: TrainState):
        params, mu, nu = dens.reset_opacity(
            state.points, state.opt.mu["points"], state.opt.nu["points"])
        opt = state.opt._replace(
            mu={"points": mu, "nets": state.opt.mu["nets"]},
            nu={"points": nu, "nets": state.opt.nu["nets"]})
        return state._replace(points=params, opt=opt)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _zprune_real_xyz(self, state: TrainState):
        """Post-densify floater prune on base-time deformed positions
        (helper_train.py:138-142)."""
        feat = gm.field_feat(state.points, state.nets, self.mcfg,
                             self.scene.fstatic)
        zero_emb = gm.time_embed(
            self.mcfg, jnp.zeros_like(state.points.temporal_pos))
        base_df = jnp.concatenate([feat, zero_emb], axis=-1)
        real_xyz = state.points.xyz + mlp_mod.apply_mlp(
            state.nets.motion_mlp, base_df)
        alive = dens.prune_mask_only(state.alive, real_xyz[:, 2] < 4.5)
        return state._replace(alive=alive)

    # ------------------------------------------------------------------
    # host control loop
    # ------------------------------------------------------------------

    def n_alive(self) -> int:
        return int(np.asarray(self.state.alive).sum())

    def grow_capacity(self, factor: int = 2):
        """Pad every per-Gaussian array; jits re-trace on the new shape."""
        old = self.state.alive.shape[0]
        new = old * factor
        extra = new - old

        def pad(x):
            if x.ndim >= 1 and x.shape[0] == old:
                return jnp.pad(x, [(0, extra)] + [(0, 0)] * (x.ndim - 1))
            return x

        def pad_points(t):
            return jax.tree_util.tree_map(pad, t)

        s = self.state
        self.state = TrainState(
            points=pad_points(s.points),
            nets=s.nets,
            opt=optim.AdamState(
                mu={"points": pad_points(s.opt.mu["points"]),
                    "nets": s.opt.mu["nets"]},
                nu={"points": pad_points(s.opt.nu["points"]),
                    "nets": s.opt.nu["nets"]},
                count=s.opt.count),
            alive=pad(s.alive), aux=pad_points(s.aux),
            inv_integral=jnp.pad(s.inv_integral, [(0, extra), (0, 0)],
                                 constant_values=1.0),
            inv_integral_densify=jnp.pad(s.inv_integral_densify,
                                         [(0, extra), (0, 0)],
                                         constant_values=1.0),
            step=s.step, dropped_hwm=s.dropped_hwm, bad_steps=s.bad_steps)
        print(f"[capacity] grown {old} -> {new}")
        self._check_tile_divisibility()

    def _sh_mask(self, active_degree: int) -> jnp.ndarray:
        """[K, 1] coefficient mask for the SH ramp (cached per degree so
        the device array is reused — a fresh host array every step would
        pay a tunnel transfer per iteration)."""
        cache = getattr(self, "_sh_mask_cache", None)
        if cache is None:
            cache = self._sh_mask_cache = {}
        if active_degree not in cache:
            # mask over the ALLOCATED coefficients (dc + rest = 16), not
            # cfg.sh_degree — params always allocate the full deg-3 set
            k = 1 + self.state.points.features_rest.shape[1]
            cache[active_degree] = jnp.asarray(
                (np.arange(k) < (active_degree + 1) ** 2)[:, None],
                jnp.float32)
        return cache[active_degree]

    def _precompile_dynamic(self, cams_g, gt_g, ts_g):
        """AOT-compile the dynamic-stage step in a background thread while
        the static stage trains.  The remote compile service runs
        concurrently with device execution, and the persistent
        JAX_COMPILATION_CACHE makes the stage-switch jit a cache hit —
        otherwise the switch stalls the run for the full remote compile."""
        import threading

        def sds(x):
            return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))

        args = jax.tree_util.tree_map(
            sds, (self.state, cams_g, gt_g, ts_g,
                  self._sh_mask(self.active_sh_degree), self._flag(True)))
        st = self._statics()

        def work():
            try:
                t0 = time.time()
                # unbound access: .lower on the bound jit does not bind self
                Trainer._train_step.lower(self, *args, st=st,
                                          stage="dynamatic").compile()
                print(f"[precompile] dynamic step ready "
                      f"({time.time() - t0:.0f}s)", flush=True)
            except Exception as e:  # never kill the run from here
                print(f"[precompile] dynamic step failed: {e}", flush=True)

        self._precompile_thread = threading.Thread(target=work, daemon=True)
        self._precompile_thread.start()

    def _flag(self, v: bool) -> jnp.ndarray:
        """Cached 0/1 device scalar (fresh host scalars every step would
        pay a tunnel transfer per iteration)."""
        cache = getattr(self, "_flag_cache", None)
        if cache is None:
            cache = self._flag_cache = {}
        if bool(v) not in cache:
            cache[bool(v)] = jnp.asarray(bool(v))
        return cache[bool(v)]

    def stage_at(self, iteration: int) -> str:
        return ("dynamatic" if iteration > self.cfg.static_iteration
                else "static")

    def integral_flags(self, iteration: int):
        cfg = self.cfg
        if cfg.all_no_intergral:
            return False, False
        use = True if cfg.use_intergral_afterdensify else \
            iteration <= cfg.densify_until_iter
        scale = iteration <= cfg.densify_until_iter
        return use, scale

    def _globalize(self, batch):
        """Host-local batch -> step inputs.  On a multi-host runtime the
        local [B/pc] arrays become globally-sharded [B] arrays along the
        mesh ``data`` axis (runtime.make_global_batch); single-process is
        the identity."""
        cams = jax.tree_util.tree_map(jnp.asarray, batch.cams)
        gt = jnp.asarray(batch.gt)
        ts = jnp.asarray(batch.timestamps)
        if jax.process_count() > 1:
            from ..parallel import runtime
            if self._global_mesh is None:
                self._global_mesh = runtime.global_mesh(
                    n_data=self.cfg.mesh_data, n_tile=self.cfg.mesh_tile)
            return runtime.make_global_batch(
                self._global_mesh, (cams, gt, ts))
        return cams, gt, ts

    def run(self, max_iterations: Optional[int] = None,
            log_every: int = 50, eval_fn=None):
        cfg = self.cfg
        total = max_iterations or cfg.iterations
        self._global_mesh = None
        loader = self.scene.train_loader(cfg.batch,
                                         num_workers=cfg.data_workers,
                                         seed=cfg.seed)
        it = int(self.state.step)
        self._bad_seen = int(jax.device_get(self.state.bad_steps))
        t_start = time.time()
        wandb = None
        if cfg.use_wandb:
            try:
                import wandb as _wandb  # optional (train.py:306 parity)
                wandb = _wandb
                wandb.init(project=cfg.wandb_project, name=cfg.exp_name,
                           config=dataclasses_dict(cfg))
            except Exception as e:
                print(f"[warn] wandb unavailable: {e}")
        for batch in loader:
            it += 1
            if it > total:
                break
            if cfg.profile_dir and it == cfg.profile_iters[0]:
                jax.profiler.start_trace(cfg.profile_dir)
            stage = self.stage_at(it)
            use_int, scale_int = self.integral_flags(it)
            if stage == "dynamatic" and it % 50 == 0:
                self.state = self._integral_refresh(self.state,
                                                    self._flag(use_int))
            if (stage == "dynamatic"
                    and getattr(self, "_precompile_thread", None)
                    is not None):
                # the stage-switch jit must WAIT for the background AOT
                # compile: issuing its own would duplicate the giant
                # compile (the two paths share only the persistent cache,
                # written on completion)
                if self._precompile_thread.is_alive():
                    print("[precompile] waiting for the dynamic compile...",
                          flush=True)
                self._precompile_thread.join()
                self._precompile_thread = None
            cams_g, gt_g, ts_g = self._globalize(batch)
            self.state, metrics = self._train_step(
                self.state, cams_g, gt_g, ts_g,
                self._sh_mask(self.active_sh_degree),
                self._flag(scale_int),
                st=self._statics(), stage=stage)

            if (it == 1 and stage == "static"
                    and cfg.static_iteration >= 100
                    and total > cfg.static_iteration):
                # first static step done (= static graph compiled); start
                # compiling the dynamic graph in the background
                self._precompile_dynamic(cams_g, gt_g, ts_g)

            if cfg.profile_dir and it == cfg.profile_iters[1]:
                jax.block_until_ready(self.state.points.xyz)
                jax.profiler.stop_trace()
                print(f"[profile] trace written to {cfg.profile_dir}")
            if cfg.nan_check and not np.isfinite(float(metrics["loss"])):
                # the reference asserts on NaN t-center grads
                # (saro_gaussian.py:278-279); we guard the loss scalar
                raise FloatingPointError(f"non-finite loss at it {it}")

            if cfg.use_shs and it % 1000 == 0:
                self.active_sh_degree = min(self.active_sh_degree + 1,
                                            cfg.sh_degree)

            self._density_control(it, stage)

            # overflow check: reading a device scalar forces a sync, which
            # through the remote TPU tunnel serializes every step on a
            # network round-trip (measured 1.6 s/it vs 0.27 s compute).
            # Check on a stride so steps pipeline; dropped_hwm accumulates
            # the max dropped IN-GRAPH, so overflows on steps between
            # strides are still caught (at most `overflow_check_every`
            # frames train on a truncated tail before the grow).
            if it % cfg.overflow_check_every == 0:
                hwm = int(jax.device_get(self.state.dropped_hwm))
                if hwm > 0:
                    self.rcfg = self.rcfg._replace(
                        max_instances=self.rcfg.max_instances * 2)
                    print(f"[warn] it {it}: up to {hwm} instances dropped "
                          f"since last check — max_instances -> "
                          f"{self.rcfg.max_instances}")
                    self.state = self.state._replace(
                        dropped_hwm=jnp.zeros((), jnp.int32))
            if it % log_every == 0 or it == 1:
                rec = {"it": it, "stage": stage,
                       "loss": float(metrics["loss"]),
                       "Ll1": float(metrics["Ll1"]),
                       "psnr": float(metrics["psnr"]),
                       "points": self.n_alive(),
                       "elapsed_s": time.time() - t_start}
                # grad-magnitude + LR-multiplier health telemetry: the
                # per-group max |grad| is the leading indicator of the
                # r3 stress divergence (which group blows up FIRST)
                if "gmax" in metrics:
                    rec["gmax"] = {k: float(f"{float(v):.3g}") for k, v
                                   in metrics["gmax"].items()}
                    rec["inv_lr_max"] = round(
                        float(metrics["inv_lr_max"]), 1)
                bad_total = int(jax.device_get(self.state.bad_steps))
                if bad_total > self._bad_seen:
                    rec["bad_step"] = bad_total - self._bad_seen
                    rec["bad_steps_total"] = bad_total
                    # attribute THIS step's non-finite grad groups (the r3
                    # stress run skipped 31-47/50 steps with no way to tell
                    # temporal_pos from hexplane); only populated when the
                    # logged step itself was bad
                    src = int(jax.device_get(metrics.get("bad_src", 0)))
                    if src:
                        rec["bad_src"] = step.bad_src_names(src)
                    print(f"[warn] {bad_total - self._bad_seen} non-finite "
                          f"step(s) skipped since it {it - log_every}"
                          + (f" (this step: {rec.get('bad_src')})"
                             if src else ""))
                    self._bad_seen = bad_total
                self.history.append(rec)
                print(f"[{it}/{total}] loss={rec['loss']:.5f} "
                      f"psnr={rec['psnr']:.2f} pts={rec['points']} "
                      f"({rec['elapsed_s']:.0f}s)", flush=True)
                if wandb is not None:
                    wandb.log(rec, step=it)
                # incremental dump so a killed run still leaves the
                # trajectory on disk (cli writes the final copy too)
                if self.scene.model_path and len(self.history) % 10 == 0:
                    with open(os.path.join(self.scene.model_path,
                                           "history.json"), "w") as f:
                        json.dump(self.history, f)
            if eval_fn is not None and it in set(cfg.testing_iterations):
                eval_fn(self, it)
            if it in set(cfg.save_iterations):
                self.scene.save(it, self.state.points, self.state.nets,
                                self.state.alive)
        return self.state

    def _density_control(self, it: int, stage: str):
        """helper_train.controlgaussians:103-174 (modes 2=N3D, 5=D-NeRF)."""
        cfg = self.cfg
        if cfg.densify not in (1, 2, 4, 5):
            return
        if it < cfg.densify_until_iter:
            if it > cfg.densify_from_iter and \
                    it % cfg.densification_interval == 0:
                self.scene.record_points(it, "before densify", self.n_alive())
                self.key, k = jax.random.split(self.key)
                st, res = self._densify(
                    self.state, k,
                    with_size_threshold=it > cfg.opacity_reset_interval)
                if bool(res.overflowed):
                    self.grow_capacity()
                    self.key, k = jax.random.split(self.key)
                    st, res = self._densify(
                        self.state, k,
                        with_size_threshold=it > cfg.opacity_reset_interval)
                self.state = st
                self.scene.record_points(it, "after densify", self.n_alive())
            if it % cfg.opacity_reset_interval == 0:
                self.state = self._reset_opacity(self.state)
        elif cfg.densify == 2 and it % 500 == 1 and stage == "dynamatic":
            self.state = self._zprune_real_xyz(self.state)
