"""Shared persistent-compile-cache bootstrap.

One agreed cache location for every entry point (bench, examples, launch):
solver compiles dominate node bring-up (the reference logs the same hot
spot, ``sde_control.py:695-720``); warming the cache in ANY entry point
must benefit all of them.

Two environment traps this module exists to absorb (both measured on the
dev-tunnel TPU, see docs/PERFORMANCE.md):

1. The image's sitecustomize imports jax at interpreter start, so
   ``JAX_COMPILATION_CACHE_DIR`` set by user code is read TOO LATE and the
   cache silently never engages — the config must be set through
   ``jax.config.update`` instead (env var still exported for subprocesses
   that might start clean).
2. The experimental tunnel backend pays a one-time ~3-7 min penalty on the
   FIRST device→host fetch of a process (all later fetches are ~ms); the
   issue side (``copy_to_host_async``) is non-blocking, so
   ``warm_fetch_async`` absorbs that penalty on a daemon thread CONCURRENT
   with solver compilation instead of serial with it.
"""
from __future__ import annotations

import os
import threading

__all__ = ["ensure_compile_cache", "warm_fetch_async"]


def _enable_cache_on_experimental_backends() -> None:
    """Allow the persistent cache on plugin TPU backends.

    ``jax._src.compilation_cache.is_cache_used`` gates the cache on a
    platform allowlist (``["tpu", "gpu", "cpu", "neuron"]``). The dev
    tunnel currently reports ``client.platform == "tpu"`` (so the gate
    passes), but that is a property of the plugin, not a contract — extend
    the gate to any backend advertising
    ``supports_executable_serialization``, the actual capability the
    allowlist approximates. Serialization failures stay non-fatal:
    ``jax_raise_persistent_cache_errors`` defaults to False.
    """
    try:
        from jax._src import compilation_cache as cc
    except Exception:  # pragma: no cover — future jax refactor
        return
    if getattr(cc.is_cache_used, "_sde4mbrl_patched", False):
        return
    orig = cc.is_cache_used

    def is_cache_used(backend) -> bool:
        used = orig(backend)
        try:
            # Only widen when the backend POSITIVELY advertises executable
            # serialization (default False: absence of the attribute must
            # not defeat the allowlist's conservatism). The private-attr
            # pokes are guarded so a future jax refactor degrades to the
            # stock behavior instead of failing every compile.
            if (not used and cc._is_cache_enabled()
                    and getattr(backend,
                                "supports_executable_serialization", False)):
                with cc._cache_initialized_mutex:
                    cc._cache_used = True
                used = True
        except Exception:  # pragma: no cover — jax internals moved
            pass
        return used

    is_cache_used._sde4mbrl_patched = True
    cc.is_cache_used = is_cache_used


def ensure_compile_cache() -> str:
    """Point the JAX persistent compilation cache at the repo-local
    ``.jax_cache`` when running from a source tree (shared with
    bench/examples), else a per-user cache dir. Respects an already-set
    ``JAX_COMPILATION_CACHE_DIR``. Returns the path.

    Works whether or not jax is already imported: the env var alone is NOT
    sufficient in this image (sitecustomize imports jax before user code,
    binding the config defaults), so the directory is also pushed through
    ``jax.config.update`` — valid any time before the first compilation.
    """
    _enable_cache_on_experimental_backends()
    cand = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cand:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cand = os.path.join(repo, ".jax_cache")
        # Repo-local cache only for a real source checkout (marker files),
        # and only when actually writable — an installed package must not
        # drop .jax_cache into site-packages, and an existing dir owned by
        # another user must not be selected just because it exists.
        is_src = any(os.path.exists(os.path.join(repo, m))
                     for m in (".git", "pyproject.toml"))
        writable = (os.access(cand, os.W_OK) if os.path.isdir(cand)
                    else os.access(repo, os.W_OK))
        if not (is_src and writable):
            cand = os.path.join(os.path.expanduser("~"), ".cache",
                                "sde4mbrl_px4_tpu_xla")
        os.environ["JAX_COMPILATION_CACHE_DIR"] = cand
    try:
        import jax

        if jax.config.jax_compilation_cache_dir != cand:
            jax.config.update("jax_compilation_cache_dir", cand)
    except Exception:  # pragma: no cover — jax absent/refactored
        pass
    return cand


_warm_fetch_thread: threading.Thread | None = None


def warm_fetch_async() -> threading.Thread:
    """Absorb the tunnel's one-time first-fetch penalty off the boot path.

    Starts (once per process) a daemon thread that fetches a 1-element
    device buffer. On a locally-attached TPU host this costs ~0.1 ms; on
    the dev tunnel the FIRST fetch of a process costs minutes
    (server-side; measured 170-412 s) while every later fetch is ~35 ms —
    so paying it here, concurrent with solver compilation, removes it from
    the compile+warm critical path. Join the returned thread before any
    latency MEASUREMENT whose first sample must not eat the penalty.
    """
    global _warm_fetch_thread
    if _warm_fetch_thread is not None:
        return _warm_fetch_thread

    def _warm():
        try:
            import jax
            import jax.numpy as jnp

            jax.device_get(jnp.zeros((1,), jnp.float32))
        except Exception:  # pragma: no cover — no device is fine
            pass

    t = threading.Thread(target=_warm, name="sde4mbrl-warm-fetch",
                         daemon=True)
    t.start()
    _warm_fetch_thread = t
    return t
