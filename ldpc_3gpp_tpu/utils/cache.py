"""Persistent XLA compilation cache.

The fast decoder unrolls the base graph into the while-loop body (by design:
zero gathers), which makes first-compile expensive — especially through the
remote-compile service.  The persistent cache makes every subsequent process
reuse the serialized executable, so sweeps and benches only ever pay compile
once per (config, batch) on a machine.
"""
import os

_DEFAULT_DIR = os.environ.get(
    "LDPC_TPU_CACHE_DIR", os.path.expanduser("~/.cache/ldpc_3gpp_tpu/xla")
)


def enable_compilation_cache(cache_dir: str = _DEFAULT_DIR) -> None:
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
