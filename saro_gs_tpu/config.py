"""Configuration system: one dataclass, reference-compatible JSON configs.

Mirrors the semantic knobs of the reference's reflection-argparse groups
(arguments/__init__.py:47-218) with the same key names, so the reference's
per-scene JSON configs (configs/*/*.json) load 1:1 via ``load_config``.
Unknown keys are collected (not fatal) for forward compatibility.
"""
from __future__ import annotations

import dataclasses
import json
from typing import List, Optional, Tuple

from .models.field import FieldConfig
from .models.gaussians import ModelConfig
from .ops.rasterize import RasterConfig
from .train.losses import LossWeights


@dataclasses.dataclass
class Config:
    # ---- data / model (ModelParams) ----
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    eval: bool = True
    loader: str = "colmap"
    use_loader: bool = True
    sh_degree: int = 3
    deform_hidden_dim: int = 128
    deform_time_encode: int = 4
    dx: bool = True
    drot: bool = True
    dopacity: bool = True
    dsh: bool = False
    use_shs: bool = True
    scale_reg: bool = False
    shs_reg: bool = False
    motion_reg: bool = False
    kplanes_config: dict = dataclasses.field(default_factory=lambda: {
        "grid_dimensions": 2, "input_coordinate_dim": 4,
        "output_coordinate_dim": 32, "resolution": [64, 64, 64, 25]})
    multires: List[int] = dataclasses.field(default_factory=lambda: [1, 2,
                                                                     4, 8])
    planemodel: str = "scale_aware"
    min_intergral: float = 0.1
    integral_renorm: bool = False      # boundary-renormalized Eq. 22 (model)
    min_interval: float = 1.0
    sigmoid_tcenter: bool = False
    pw: bool = False
    duration: int = 50
    densify: int = 0
    dataset: str = ""
    exp_name: str = "default"

    # ---- optimization (OptimizationParams) ----
    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    trbfc_lr: float = 0.0001
    trbfc_lr_final: float = 0.0000001
    batch: int = 2
    mlp_lr: float = 1.6e-4
    mlp_lr_final: float = 1.6e-7
    hexplane_lr: float = 3.2e-3
    hexplane_lr_final: float = 3.2e-6
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    lambda_dtstd: float = 0.0
    lambda_dscale_reg: float = 0.0
    lambda_dshs_reg: float = 0.0
    lambda_dmotion_reg: float = 0.0
    lambda_dplanetv: float = 0.0
    lambda_dtime_smooth: float = 0.0
    densification_interval: int = 100
    opacity_reset_interval: int = 3_000
    densify_from_iter: int = 500
    densify_until_iter: int = 9_000
    densify_grad_threshold: float = 0.0002
    opthr: float = 0.005
    preprocesspoints: int = 40
    static_iteration: int = -1
    use_intergral_afterdensify: bool = True
    all_no_intergral: bool = False
    use_weight_decay: bool = False
    test_iteration: int = 20001

    # ---- TPU-framework-specific ----
    capacity: int = 1 << 18            # Gaussian slot capacity (auto-grown)
    raster_backend: str = "pallas"
    tile_size: int = 32                # pallas path; jax path uses 16
    max_instances: int = 1 << 20
    max_slots: int = 4096          # per-tile cap, pure-JAX backend only
    chunk: int = 128
    # fast-path kernel flags (benched configuration; see RasterConfig for
    # semantics).  The parity-exact combination for oracle comparisons is
    # prefix="roll", packed=False, expander="sort", tight_rect=False.
    raster_prefix: str = "matmul"
    raster_packed: bool = True
    raster_expander: str = "pallas"
    # measured SLOWER on v5e (13.7 vs 11.5 ms/frame fwd: a 6-deep HIGHEST
    # contraction underutilizes the MXU); kept as a parity-gated variant
    raster_alpha_matmul: bool = False
    tight_rect: bool = True
    # probe one frame at scene load and right-size max_instances (with
    # densify headroom) before the first train-step compile
    presize_instances: bool = True
    presize_factor: float = 3.0
    overflow_check_every: int = 25     # instance-overflow poll stride
    # big-splat screen-space prune threshold in PIXELS, active after the
    # first opacity reset.  The reference hard-codes 20 for 1352-px-wide
    # Neural3D renders (saro_gaussian.densify_pruneclone:705-739); the
    # world-space size it prunes scales with resolution, so halved-res
    # scenes need a proportional value or they mass-prune mid-size splats.
    max_screen_size: int = 20
    # cap on the per-Gaussian inverse-integral LR multiplier (reference
    # semantics: unbounded up to 1/min_intergral ~ 625x, saro_gaussian.py
    # update_learning_rate:345-398); 0 = off.  Remedial knob for
    # reference-scale regimes — the r3 stress run went non-finite after a
    # +16.7k densify with trbfc_lr 1e-4 x large inv_integral (Adam steps
    # are ~lr-sized, so bounding the LR bounds the update; clipping
    # GRADIENTS would be a no-op under Adam's scale invariance)
    inv_lr_clip: float = 0.0
    # relative scale floor (x camera extent) applied after each Adam step;
    # 0 = off (reference has no floor).  See train/step.py StepStatics.
    scale_floor: float = 0.0
    # prune points whose max scale < prune_min_scale * extent at each
    # densify pass; 0 = off (reference has no tiny-scale prune).  Targets
    # the collapsed-scale/saturated-opacity speckle population (see
    # models/densify.py prune section).
    prune_min_scale: float = 0.0
    seed: int = 666
    data_workers: int = 4
    mesh_data: int = 1                 # device-mesh axes (parallel/)
    mesh_tile: int = 1
    save_iterations: List[int] = dataclasses.field(default_factory=list)
    testing_iterations: List[int] = dataclasses.field(default_factory=list)
    # observability (reference: wandb in train.py:306-336, cuda-event
    # timing; here both optional/gated)
    use_wandb: bool = False
    wandb_project: str = "saro-gs-tpu"
    profile_dir: str = ""              # jax.profiler trace output ("" = off)
    profile_iters: tuple = (100, 110)  # [start, stop) iteration window
    nan_check: bool = False            # debug NaN guard on metrics

    unknown_keys: dict = dataclasses.field(default_factory=dict)

    # ---- derived static configs ----
    def field_config(self) -> FieldConfig:
        kc = self.kplanes_config
        return FieldConfig(resolution=tuple(kc["resolution"]),
                           out_dim=int(kc["output_coordinate_dim"]),
                           multires=tuple(self.multires))

    def model_config(self) -> ModelConfig:
        return ModelConfig(
            sh_degree=self.sh_degree,
            deform_hidden_dim=self.deform_hidden_dim,
            deform_time_encode=self.deform_time_encode,
            dx=self.dx, drot=self.drot, dopacity=self.dopacity,
            dsh=self.dsh, sigmoid_tcenter=self.sigmoid_tcenter,
            min_intergral=self.min_intergral,
            integral_renorm=self.integral_renorm,
            min_interval=self.min_interval,
            scale_reg=self.scale_reg, shs_reg=self.shs_reg,
            motion_reg=self.motion_reg, field=self.field_config())

    def raster_config(self) -> RasterConfig:
        if self.raster_backend == "pallas":
            t = self.tile_size
            return RasterConfig(tile_x=t, tile_y=t, chunk=self.chunk,
                                max_instances=self.max_instances,
                                backend="pallas",
                                prefix=self.raster_prefix,
                                packed=self.raster_packed,
                                expander=self.raster_expander,
                                tight_rect=self.tight_rect,
                                alpha_matmul=self.raster_alpha_matmul)
        return RasterConfig(tile_x=16, tile_y=16, chunk=64,
                            max_instances=self.max_instances,
                            max_slots=self.max_slots, backend="jax",
                            tight_rect=self.tight_rect)

    def loss_weights(self) -> LossWeights:
        return LossWeights(
            lambda_dssim=self.lambda_dssim,
            lambda_dtstd=self.lambda_dtstd,
            lambda_dscale_reg=self.lambda_dscale_reg,
            lambda_dshs_reg=self.lambda_dshs_reg,
            lambda_dmotion_reg=self.lambda_dmotion_reg,
            lambda_dplanetv=self.lambda_dplanetv,
            lambda_dtime_smooth=self.lambda_dtime_smooth)


def load_config(json_path: Optional[str] = None, **overrides) -> Config:
    """Defaults <- per-scene JSON <- keyword overrides (helper3dg.py:66-80
    precedence)."""
    cfg = Config()
    known = {f.name for f in dataclasses.fields(Config)}
    values = {}
    if json_path:
        with open(json_path) as f:
            values.update(json.load(f))
    values.update(overrides)
    unknown = {}
    for k, v in values.items():
        if k in known:
            setattr(cfg, k, v)
        else:
            unknown[k] = v
    cfg.unknown_keys = unknown
    return cfg


def save_cfg_args(cfg: Config, path: str):
    """Persist the config next to the model (the reference writes a
    ``cfg_args`` Namespace repr; we write JSON — saner round-trip)."""
    d = dataclasses.asdict(cfg)
    with open(path, "w") as f:
        json.dump(d, f, indent=2)


def load_cfg_args(path: str) -> Config:
    with open(path) as f:
        d = json.load(f)
    d.pop("unknown_keys", None)
    return load_config(**d)
