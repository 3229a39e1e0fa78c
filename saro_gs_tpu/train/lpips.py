"""LPIPS perceptual metric, pure JAX (reference: lpipsPyTorch/).

Re-implements the LPIPS architecture (Zhang et al. 2018) used by the
reference's ``lpips(x, y, net_type='alex'|'vgg')``
(lpipsPyTorch/__init__.py:6-21, modules/lpips.py): a frozen AlexNet or
VGG16 feature trunk, unit-normalized channel activations at 5 taps,
squared differences projected by learned 1x1 "lin" heads, averaged over
space and summed over taps.

This environment has no network egress and no torchvision, so pretrained
weights cannot be fetched at runtime.  Weight resolution order:

  1. a local ``.npz`` (``save_weights_npz`` documents the layout;
     ``convert_torch_state`` maps torchvision ``alexnet().features`` /
     ``vgg16().features`` + LPIPS ``lin{i}.model.1.weight`` state dicts
     into it — run that once on any machine with the torch weights and
     drop the npz under ``weights/`` or point SARO_LPIPS_WEIGHTS at it),
  2. otherwise a DETERMINISTIC FIXTURE set (seed 0 Kaiming convs,
     non-negative lin heads): random-feature perceptual distance.  It is
     a valid relative metric (0 iff identical, symmetric, grows with
     perceptual difference — see tests/test_lpips.py) but its values are
     NOT comparable to published LPIPS numbers; eval JSONs record the
     provenance under ``LPIPS-weights`` so the two are never confused.

Set SARO_LPIPS_FIXTURE=0 to disable the fallback (then ``lpips`` raises
without a weight file, and eval omits the metric).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet normalization used by LPIPS's ScalingLayer (shift/scale in
# [-1,1] space; equivalent to the standard mean/std in [0,1] space).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# conv specs per trunk: (out_channels, kernel, stride, pad, pool_before)
# AlexNet features: taps after each ReLU block
_ALEX = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1), (256, 3, 1, 1),
         (256, 3, 1, 1)]
_ALEX_POOL_BEFORE = {1, 2}   # maxpool(3,2) before convs 1 and 2
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
            "M", 512, 512, 512]
_VGG_TAPS = {1, 3, 6, 9, 12}  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b.reshape(1, -1, 1, 1)


def _maxpool(x, k, s):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID")


def _alex_features(params: Dict[str, jnp.ndarray], x) -> List[jnp.ndarray]:
    feats = []
    for i, (_, _, stride, pad) in enumerate(_ALEX):
        if i in _ALEX_POOL_BEFORE:
            x = _maxpool(x, 3, 2)
        x = _conv(x, params[f"conv{i}_w"], params[f"conv{i}_b"], stride, pad)
        x = jax.nn.relu(x)
        feats.append(x)
    return feats


def _vgg_features(params: Dict[str, jnp.ndarray], x) -> List[jnp.ndarray]:
    feats = []
    ci = 0
    for spec in _VGG_CFG:
        if spec == "M":
            x = _maxpool(x, 2, 2)
            continue
        x = _conv(x, params[f"conv{ci}_w"], params[f"conv{ci}_b"], 1, 1)
        x = jax.nn.relu(x)
        if ci in _VGG_TAPS:
            feats.append(x)
        ci += 1
    return feats


def _normalize(feat, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(feat ** 2, axis=1, keepdims=True))
    return feat / (norm + eps)


def lpips_from_params(params: Dict[str, jnp.ndarray], x, y,
                      net_type: str = "alex") -> jnp.ndarray:
    """LPIPS distance between images x, y in [0,1], shape [3,H,W] or
    [B,3,H,W]."""
    if x.ndim == 3:
        x, y = x[None], y[None]
    shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
    scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)

    def prep(img):
        return (img * 2.0 - 1.0 - shift) / scale

    extract = _alex_features if net_type == "alex" else _vgg_features
    fx = extract(params, prep(x))
    fy = extract(params, prep(y))
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (_normalize(a) - _normalize(b)) ** 2
        w = params[f"lin{i}_w"].reshape(1, -1, 1, 1)   # [C] non-neg weights
        total = total + jnp.mean(jnp.sum(d * w, axis=1), axis=(1, 2))
    return total.squeeze()


# --------------------------------------------------------------- weights ---

_CACHE: Dict[str, Dict[str, jnp.ndarray]] = {}
_SOURCE: Dict[str, str] = {}


def weights_path(net_type: str) -> str:
    root = os.environ.get(
        "SARO_LPIPS_WEIGHTS",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "weights"))
    return os.path.join(root, f"lpips_{net_type}.npz")


def _fixture_enabled() -> bool:
    return os.environ.get("SARO_LPIPS_FIXTURE", "1") == "1"


def load_weights(net_type: str = "alex") -> Optional[Dict[str, jnp.ndarray]]:
    if net_type in _CACHE:
        return _CACHE[net_type]
    path = weights_path(net_type)
    if not os.path.exists(path):
        if not _fixture_enabled():
            return None
        params = {k: jnp.asarray(v) for k, v in init_random_weights(
            jax.random.PRNGKey(0), net_type).items()}
        _SOURCE[net_type] = "fixture-random-seed0"
        _CACHE[net_type] = params
        return params
    raw = np.load(path)
    params = {k: jnp.asarray(raw[k]) for k in raw.files}
    _SOURCE[net_type] = os.path.basename(path)
    _CACHE[net_type] = params
    return params


def weights_source(net_type: str = "alex") -> Optional[str]:
    """Provenance of the loaded weights ('fixture-random-seed0' or the
    npz filename); None when nothing is loaded/loadable."""
    if net_type not in _CACHE and load_weights(net_type) is None:
        return None
    return _SOURCE.get(net_type)


def save_weights_npz(params: Dict[str, np.ndarray], net_type: str,
                     path: Optional[str] = None):
    """Layout: conv{i}_w [O,I,kh,kw], conv{i}_b [O], lin{i}_w [C]."""
    path = path or weights_path(net_type)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
    return path


def convert_torch_state(trunk_state: Dict[str, "np.ndarray"],
                        lin_state: Dict[str, "np.ndarray"],
                        net_type: str = "alex") -> Dict[str, np.ndarray]:
    """Map torchvision ``alexnet().features``/``vgg16().features`` and LPIPS
    ``lin{i}.model.1.weight`` state dicts (as numpy) into our npz layout."""
    params: Dict[str, np.ndarray] = {}
    conv_keys = sorted(
        {k.split(".")[0] for k in trunk_state if k.endswith(".weight")},
        key=int)
    for i, k in enumerate(conv_keys):
        params[f"conv{i}_w"] = np.asarray(trunk_state[f"{k}.weight"])
        params[f"conv{i}_b"] = np.asarray(trunk_state[f"{k}.bias"])
    for i in range(5):
        for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if cand in lin_state:
                params[f"lin{i}_w"] = np.asarray(
                    lin_state[cand]).reshape(-1)
                break
        else:
            raise KeyError(f"lin head {i} not found in lin state dict")
    return params


def init_random_weights(key, net_type: str = "alex") -> Dict[str, np.ndarray]:
    """Random weights with the correct shapes (tests / smoke only)."""
    rng = np.random.RandomState(
        int(jax.random.randint(key, (), 0, 2 ** 31 - 1)))
    params: Dict[str, np.ndarray] = {}
    if net_type == "alex":
        in_c = 3
        for i, (out_c, k, _, _) in enumerate(_ALEX):
            params[f"conv{i}_w"] = rng.randn(out_c, in_c, k, k).astype(
                np.float32) * np.sqrt(2.0 / (in_c * k * k))
            params[f"conv{i}_b"] = np.zeros(out_c, np.float32)
            in_c = out_c
        taps = [c for c, *_ in _ALEX]
    else:
        in_c = 3
        ci = 0
        taps = []
        for spec in _VGG_CFG:
            if spec == "M":
                continue
            params[f"conv{ci}_w"] = rng.randn(spec, in_c, 3, 3).astype(
                np.float32) * np.sqrt(2.0 / (in_c * 9))
            params[f"conv{ci}_b"] = np.zeros(spec, np.float32)
            if ci in _VGG_TAPS:
                taps.append(spec)
            in_c = spec
            ci += 1
    for i, c in enumerate(taps):
        params[f"lin{i}_w"] = np.abs(rng.randn(c).astype(np.float32)) * 0.01
    return params


def lpips(x, y, net_type: str = "alex") -> jnp.ndarray:
    """Reference-parity entry point (lpipsPyTorch/__init__.py:6-21).

    Raises FileNotFoundError when no local weight file exists."""
    params = load_weights(net_type)
    if params is None:
        raise FileNotFoundError(
            f"LPIPS weights not found at {weights_path(net_type)}; this "
            "offline environment ships no pretrained nets.  Convert them "
            "with lpips.convert_torch_state + save_weights_npz, or set "
            "SARO_LPIPS_WEIGHTS.")
    return lpips_from_params(params, jnp.asarray(x), jnp.asarray(y),
                             net_type)


def lpips_available(net_type: str = "alex") -> bool:
    return load_weights(net_type) is not None
