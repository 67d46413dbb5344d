"""Shared persistent-compile-cache bootstrap.

One agreed cache location for every entry point (bench, examples, launch):
solver compiles dominate node bring-up (the reference logs the same hot
spot, ``sde_control.py:695-720``); warming the cache in ANY entry point
must benefit all of them. Must run before the JAX backend initializes.
"""
from __future__ import annotations

import os

__all__ = ["ensure_compile_cache"]


def ensure_compile_cache() -> str:
    """Point JAX_COMPILATION_CACHE_DIR at the repo-local ``.jax_cache``
    when running from a source tree (shared with bench/examples), else a
    per-user cache dir. Respects an already-set env var. Returns the path.
    """
    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cand = os.path.join(repo, ".jax_cache")
    # Repo-local cache only for a real source checkout (marker files), and
    # only when actually writable — an installed package must not drop
    # .jax_cache into site-packages, and an existing dir owned by another
    # user must not be selected just because it exists.
    is_src = any(os.path.exists(os.path.join(repo, m))
                 for m in (".git", "pyproject.toml"))
    writable = (os.access(cand, os.W_OK) if os.path.isdir(cand)
                else os.access(repo, os.W_OK))
    if not (is_src and writable):
        cand = os.path.join(os.path.expanduser("~"), ".cache",
                            "sde4mbrl_px4_tpu_xla")
    os.environ["JAX_COMPILATION_CACHE_DIR"] = cand
    return cand
