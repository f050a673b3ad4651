"""Runtime configuration (SURVEY.md §5: the reference has compile-time
constants only; runtime knobs were function args). One small dataclass
gathers the deployment-relevant knobs."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PirConfig:
    # data layout
    slot_bytes: int = 256
    group_size: int = 1  # adjacent slots per row group (query.go:21)

    # protocol
    num_shares: int = 2  # logical PIR servers
    sec_param_bytes: int = 8  # statistical security (test_constants.go:16)
    paillier_bits: int = 1024  # cPIR key size (db_test.go:330)

    # engines
    engine: str = "auto"  # auto | host | native | tpu
    min_device_nodes: int = 32  # host-prefix cutoff for TPU expansion

    # mesh (rows = 'tp', query batch = 'dp'; parallel/mesh.py)
    mesh_tp: int = 1
    mesh_dp: int = 1

    def validate(self) -> "PirConfig":
        if self.num_shares < 2:
            raise ValueError("need at least 2 non-colluding servers")
        if self.engine not in ("auto", "host", "native", "tpu"):
            raise ValueError(f"unknown engine {self.engine}")
        if self.group_size < 1:
            raise ValueError("group_size must be >= 1")
        return self


def enable_compile_cache(path: str | None = None) -> None:
    """Best-effort persistent XLA compile cache (huge win on remote-compile
    rigs; see CLAUDE.md). Call before the first jit compilation."""
    import os

    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   "/tmp/pir_tpu_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def pick_engine(cfg: PirConfig):
    """Resolve 'auto' to the best available engine."""
    if cfg.engine != "auto":
        return cfg.engine
    try:
        import jax

        if jax.devices()[0].platform != "cpu":
            return "tpu"
    except Exception:
        pass
    try:
        from . import native

        if native.available():
            return "native"
    except Exception:
        pass
    return "host"
