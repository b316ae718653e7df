"""Persistent XLA compilation cache setup.

The reference's AOT-deployment story is the NVRTC/CuPy kernel disk cache
(/root/reference/examples/04-AOT_deployment.py: first run compiles,
later runs load cubins).  The TPU equivalent is the JAX/XLA persistent
compilation cache: kernel classes compile once per (class, tier, bucket)
and are reloaded from disk afterwards.  Enabled automatically on package
import; override the location with JQC_CACHE_DIR, disable with
JQC_CACHE_DIR=0.
"""

from __future__ import annotations

import os


def enable_persistent_cache():
    loc = os.environ.get("JQC_CACHE_DIR", os.path.expanduser("~/.cache/joltqc_tpu/xla"))
    if loc in ("0", "off", "none"):
        return
    import jax

    try:
        # The XLA:CPU AOT cache can reload code compiled for a different
        # host feature set and then hang/SIGILL at execution (observed:
        # 'Machine type used for XLA:CPU compilation doesn't match ...').
        # Only enable the disk cache for accelerator backends.
        if jax.default_backend() == "cpu":
            return
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or read-only fs: run without the disk cache
