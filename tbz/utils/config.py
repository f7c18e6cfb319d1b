"""Runtime configuration (SURVEY §5.6 obligation).

The reference's only knobs are compile-time feature switches
(tuning.lisp:10-41 reader conditionals). Here configuration is a typed
runtime dataclass: kernel variants, padding buckets, backend policy,
mesh shape — threadable through the API and serializable for runs.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class Config:
    # Backend policy: where LZ77 resolution + checksums run.
    backend: str = "auto"            # 'auto' | 'host' | 'device'
    frontend: str = "auto"           # 'auto' | 'native' | 'python' | 'device'

    # Padding/shape buckets (jit compile-cache friendliness).
    min_out_capacity: int = 4096
    pow2_buckets: bool = True

    # Checksum kernel tuning.
    crc_lane_bytes: int = 128
    adler_chunk: int = 4096
    # One-shot decompress verifies on host by default (output is
    # already fetched; a device checksum adds a round trip). Set 1 /
    # TBZ_DEVICE_CHECKSUMS=1 to force the device tail kernels there.
    device_checksums: bool = False

    # Encoder.
    level: int = 6

    # Mesh (dp = streams, sp = sequence).
    mesh_dp: int | None = None       # None = all devices
    mesh_sp: int = 1

    # Streaming.
    window_bytes: int = 32768

    # Observability.
    profile: bool = False            # enable stage timers
    trace_dir: str | None = None     # jax.profiler trace output

    @staticmethod
    def from_env(prefix: str = "TBZ_") -> "Config":
        c = Config()
        for f in dataclasses.fields(Config):
            v = os.environ.get(prefix + f.name.upper())
            if v is None:
                continue
            if f.type in ("int", int, "int | None"):
                setattr(c, f.name, int(v))
            elif f.type in ("bool", bool):
                setattr(c, f.name, v.lower() in ("1", "true", "yes"))
            else:
                setattr(c, f.name, v)
        return c


_default: Config | None = None


def get_config() -> Config:
    """Process-wide config; initialized from TBZ_* env vars on first use
    (e.g. TBZ_BACKEND=device, TBZ_PROFILE=1, TBZ_LEVEL=9)."""
    global _default
    if _default is None:
        _default = Config.from_env()
    return _default


def set_config(cfg: Config) -> None:
    global _default
    _default = cfg
