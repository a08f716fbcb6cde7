"""Persistent XLA compilation cache for CLI entry points.

CLI invocations are fresh processes, so every `fresnel render` / training
launch pays full compile time (the reference's C++ binary has no such cost;
here first-compile over the device tunnel is tens of seconds).  JAX's
persistent compilation cache eliminates it on repeat invocations — measured
59 s -> 18.6 s for a warm `fresnel render` at 256².

Opt out with FRESNEL_NO_COMPILATION_CACHE=1; an explicit
JAX_COMPILATION_CACHE_DIR always wins.
"""

from __future__ import annotations

import os
from pathlib import Path


def _machine_fingerprint() -> str:
    """Short hash of the host CPU feature set (+ jax version).

    XLA:CPU AOT-compiles against the *compiling* machine's features; the
    VM this repo runs on can be reset and land on different hardware while
    $HOME survives, and loading a stale cache entry then risks SIGILL
    (cpu_aot_loader logs 'Machine type ... doesn't match'). Keying the
    cache directory by the feature set makes each machine generation get
    its own cache instead of tripping over the last one's.
    """
    import hashlib
    import platform

    import jax

    # x86 exposes "flags", aarch64 "Features"; also fold in the model name
    # and machine arch so ANY migration across machine generations rolls
    # the key even if the feature line is missing or identical in prefix.
    feature = ""
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.startswith(("flags", "Features", "model name")):
                    feature += ln
                    if len(feature) > 4096:
                        break
    except OSError:
        pass
    backend = os.environ.get("JAX_PLATFORMS", "")
    key = (f"{jax.__version__}|{platform.machine()}|{backend}|"
           f"{feature}").encode()
    return hashlib.sha256(key).hexdigest()[:12]


def enable_compilation_cache() -> None:
    """Point JAX's persistent compile cache at a per-user dir (idempotent).

    Call from CLI main() BEFORE the first jit executes.  Library imports
    never call this — embedders keep full control of global JAX config.
    """
    if os.environ.get("FRESNEL_NO_COMPILATION_CACHE"):
        return
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured it via env
    cache_dir = Path(
        os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache")
    ) / "fresnel_tpu" / "jax_cache" / _machine_fingerprint()
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        # Cache everything, including fast compiles — CLI latency is
        # dominated by many medium-sized programs, not one giant one.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError):
        pass  # unwritable cache dir or older jax: run uncached
