"""Device kernels (banded SWIPE oracle/XLA/Pallas, 3-frame SWIPE).

Importing this package enables jax's persistent compilation cache so the
pow2-bucketed kernel shapes compile once per machine instead of once per
process (the reference's analog is its one-time CPU dispatch probe).
Disable with DIAMOND_TPU_NO_JIT_CACHE=1 or point the directory elsewhere
with DIAMOND_TPU_JIT_CACHE.
"""
import os
import tempfile


def _enable_jit_cache():
    if os.environ.get("DIAMOND_TPU_NO_JIT_CACHE"):
        return
    try:
        import jax

        path = os.environ.get(
            "DIAMOND_TPU_JIT_CACHE",
            os.path.join(tempfile.gettempdir(),
                         f"diamond_tpu_jit_cache_{os.getuid()}"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_jit_cache()
