"""Config -> RasterConfig wiring: the benched fast path must be what the
product CLI ships (VERDICT r1: the 63-FPS flags were bench-only)."""
import dataclasses

from saro_gs_tpu.config import Config, load_config


def test_default_raster_config_is_fast_path():
    rc = Config().raster_config()
    assert rc.backend == "pallas"
    assert rc.tile_x == rc.tile_y == 32
    assert rc.chunk == 128
    assert rc.prefix == "matmul"
    assert rc.packed is True
    assert rc.expander == "pallas"
    assert rc.tight_rect is True


def test_parity_combination_reachable():
    cfg = load_config(None, raster_prefix="roll", raster_packed=False,
                      raster_expander="sort", tight_rect=False)
    rc = cfg.raster_config()
    assert (rc.prefix, rc.packed, rc.expander, rc.tight_rect) == \
        ("roll", False, "sort", False)


def test_jax_backend_honors_tight_rect():
    cfg = load_config(None, raster_backend="jax", tight_rect=False)
    rc = cfg.raster_config()
    assert rc.backend == "jax" and rc.tight_rect is False


def test_flags_round_trip_json(tmp_path):
    import json
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"raster_prefix": "roll",
                             "raster_packed": False,
                             "presize_factor": 3.0}))
    cfg = load_config(str(p))
    assert cfg.raster_prefix == "roll"
    assert cfg.raster_packed is False
    assert cfg.presize_factor == 3.0
    assert not cfg.unknown_keys
