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
    engine: str = "auto"  # auto | host | native | tpu | mesh
    # cPIR multi-exponentiation backend (encrypted._scan_fn): None =
    # auto (native C++ then CPython); 'tpu' = the batched Montgomery
    # engine on the JAX backend (crypto/mont_tpu.py)
    paillier_engine: str | None = None
    min_device_nodes: int = 32  # host-prefix cutoff for TPU expansion
    # Pallas kernel dispatch for the TPU engine: None = auto (on for the
    # TPU backend only); True forces interpret-mode kernels off-TPU
    # (CI exercises the fused serving stream this way)
    use_pallas: bool | None = None

    # mesh (rows = 'tp', query batch = 'dp'; parallel/mesh.py). Setting
    # mesh_tp * mesh_dp > 1 with engine auto/tpu selects the multi-chip
    # MeshPirServer engine.
    mesh_tp: int = 1
    mesh_dp: int = 1
    # lane-word width of the compat cascade head on the mesh engine
    # (root-start compat step applies when device_bits - log2(tp) >
    # 5 + log2(w); smaller w admits shallower domains at lower VPU
    # occupancy — same knob as TpuPirServer.compat_pallas_w)
    mesh_compat_w: int = 128

    def validate(self) -> "PirConfig":
        if self.num_shares < 2:
            raise ValueError("need at least 2 non-colluding servers")
        if self.engine not in ("auto", "host", "native", "tpu", "mesh"):
            raise ValueError(f"unknown engine {self.engine}")
        if self.paillier_engine not in (None, "tpu", "native", "python"):
            raise ValueError(f"unknown paillier engine {self.paillier_engine}")
        if self.group_size < 1:
            raise ValueError("group_size must be >= 1")
        if self.mesh_tp < 1 or self.mesh_dp < 1:
            raise ValueError("mesh_tp/mesh_dp must be >= 1")
        if self.mesh_compat_w < 1 or (self.mesh_compat_w &
                                      (self.mesh_compat_w - 1)):
            raise ValueError("mesh_compat_w must be a power of two")
        return self


def default_cache_dir() -> str:
    """Default persistent-cache location: the repo-level .xla_cache (it
    ships pre-warmed entries for the bench shapes, surviving /tmp wipes),
    falling back to /tmp when the package is installed read-only.

    NOTE on key stability: with stabilize_pallas_cache_keys() active,
    cache keys were measured (r3) to be independent of the order and set
    of prior Pallas lowerings in the process — any program that reaches
    the same jit shape hits the same entry. The remaining dependence is
    the cache directory's own ABSOLUTE PATH: JAX embeds it in
    compile_options (debug_options.xla_gpu_per_fusion_autotune_cache_dir),
    which is hashed into the key, so shipped entries only hit when the
    cache dir resolves to the same absolute path they were written under
    (here: <repo>/.xla_cache)."""
    import os

    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cand = os.path.join(repo, ".xla_cache")
    try:
        os.makedirs(cand, exist_ok=True)
        if os.access(cand, os.W_OK):
            return cand
    except OSError:
        pass
    return "/tmp/pir_tpu_jax_cache"


_pallas_keys_stabilized = False


def stabilize_pallas_cache_keys() -> None:
    """Make Pallas/Mosaic cache keys deterministic across processes.

    The Mosaic kernel module is serialized (with its MLIR debug
    locations) into the outer StableHLO module as a string attribute, so
    JAX's strip-debuginfo pass — which runs on the outer module before
    hashing the compile-cache key — never reaches it. The embedded
    locations make the key depend on (a) source line numbers of every
    frame in the kernel's trace and (b) the sequence of prior Pallas
    lowerings in the process (location interning). Both were measured to
    flip the key for byte-identical kernels, defeating the persistent
    cache entirely on remote-compile rigs.

    This strips debug info from the Mosaic module just before its
    serialization, making the payload a pure function of the kernel
    computation. Cost: Mosaic compile errors lose source locations.
    Must run before the first Pallas lowering; idempotent."""
    global _pallas_keys_stabilized
    if _pallas_keys_stabilized:
        return
    try:
        import jax._src.tpu_custom_call as tcc
        from jax._src.lib.mlir import passmanager as _pm

        _orig = tcc._lower_mosaic_module_to_asm

        def _stable_lower(module, *args, **kwargs):
            # Signature-agnostic passthrough: only the module operand is
            # needed for the strip; forwarding the rest verbatim means a
            # JAX upgrade that changes _lower_mosaic_module_to_asm's
            # private signature degrades to unstabilized keys instead of
            # raising TypeError on every Pallas lowering.
            try:
                with module.context:
                    _pm.PassManager.parse(
                        "builtin.module(strip-debuginfo)"
                    ).run(module.operation)
            except Exception:
                pass  # diagnostics-only loss; fall through to serialize
            return _orig(module, *args, **kwargs)

        tcc._lower_mosaic_module_to_asm = _stable_lower
        _pallas_keys_stabilized = True
    except Exception:
        pass


def enable_compile_cache(path: str | None = None) -> None:
    """Best-effort persistent XLA compile cache (huge win on remote-compile
    rigs; see CLAUDE.md). Call before the first jit compilation."""
    stabilize_pallas_cache_keys()
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          path or default_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def pick_engine(cfg: PirConfig):
    """Resolve 'auto' to the best available engine. mesh_tp/mesh_dp > 1
    promotes auto/tpu to the multi-chip mesh engine."""
    multi = cfg.mesh_tp * cfg.mesh_dp > 1
    if cfg.engine == "mesh":
        return "mesh"
    if cfg.engine == "tpu":
        return "mesh" if multi else "tpu"
    if cfg.engine != "auto":
        return cfg.engine
    if multi:
        return "mesh"
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
