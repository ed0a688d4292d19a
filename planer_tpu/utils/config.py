"""Framework configuration: one dataclass + environment-variable overrides.

The reference's "config" is scattered (the core() backend call, per-op IR
kwargs, tile() kwargs — SURVEY §5 config).  Here the runtime knobs live in a
single dataclass; per-op config stays in the IR kwargs exactly as in the
reference.  Every field can be overridden by a ``PLANER_<FIELD>`` env var.
"""
from __future__ import annotations

import dataclasses
import os

__all__ = ["Config", "get_config", "set_config"]


@dataclasses.dataclass
class Config:
    # precision policy for the compiled path
    compute_dtype: str = "float32"       # activations dtype inside jit
    quant_mode: str = "int8"             # default for Net.quantize()
    # mesh defaults (parallel.make_mesh when shape unspecified)
    mesh_data: int = 0                   # 0 = all devices on data axis
    mesh_model: int = 1
    # tiled-inference defaults (utils.tile)
    tile_window: int = 1024
    tile_margin: float = 0.1
    # serving defaults
    serve_buckets: tuple = (1, 2, 4, 8, 16, 32)
    serve_max_delay_ms: float = 5.0
    # compilation cache (empty = disabled)
    compile_cache_dir: str = ""

    @staticmethod
    def from_env() -> "Config":
        cfg = Config()
        for f in dataclasses.fields(Config):
            env = os.environ.get(f"PLANER_{f.name.upper()}")
            if env is None:
                continue
            if f.type in ("int",):
                setattr(cfg, f.name, int(env))
            elif f.type in ("float",):
                setattr(cfg, f.name, float(env))
            elif f.type in ("tuple",):
                setattr(cfg, f.name, tuple(int(x) for x in env.split(",")))
            else:
                setattr(cfg, f.name, env)
        return cfg

    def apply(self):
        """Apply process-level settings (compilation cache)."""
        if self.compile_cache_dir:
            import jax
            jax.config.update("jax_compilation_cache_dir",
                              self.compile_cache_dir)
        return self


_config: Config | None = None


def get_config() -> Config:
    global _config
    if _config is None:
        _config = Config.from_env()
    return _config


def set_config(cfg: Config) -> Config:
    global _config
    _config = cfg
    return cfg
