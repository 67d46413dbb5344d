"""AOT executable cache: compile once per machine, load forever (L5).

Node bring-up is dominated by the solver compile RPCs, and on the dev
tunnel those RPCs have multi-minute weather (server-side queueing;
measured: the same flagship compile takes 1.5 s or 120+ s run to run —
memory ``axon-tunnel-performance-traps``). JAX's own persistent cache
keys proved fragile across processes here, so this module caches the
COMPILED PJRT executables under a key this client computes itself:

    sha256(lowered StableHLO text with Mosaic payloads stripped
           + package source hash + jax version + backend fingerprint)

The StableHLO text is byte-stable across processes EXCEPT the Mosaic
custom-call payloads (serialized MLIR bytecode embeds nondeterminism),
which are stripped; the kernel code they encode is covered by the
package-source hash, so any code change still invalidates. A warm
machine's bring-up then does ZERO compile RPCs — it deserializes the
stored executable (``jax.experimental.serialize_executable``, measured
~0 s) and runs. A stale or incompatible artifact (code change ->
different key; jaxlib/libtpu upgrade -> deserialize raises) falls back
to a fresh compile transparently.

Reference analogue: the compile-at-startup hot spot the reference logs at
``sde_control.py:695-720``; this is the "AOT-serialize the flagship
executables" fix (VERDICT r3 item 1)."""
from __future__ import annotations

import hashlib
import os
import pickle
import re
from typing import Optional

import jax

__all__ = ["load_or_compile", "aot_cache_dir"]

# Mosaic custom-call payloads (serialized MLIR bytecode) are NOT
# byte-stable across processes — the one nondeterministic region of an
# otherwise byte-identical lowering (measured: two fresh processes differ
# only inside backend_config). They are stripped from the key text; the
# kernel CODE they encode is covered by the package-source hash instead,
# so a kernel edit still invalidates artifacts.
_PAYLOAD_RE = re.compile(r'"\{\\22custom_call_config[^"]*"')

_src_hash_cache: Optional[str] = None


def _package_source_hash() -> str:
    """sha256 over every .py file of this package (sorted walk): any code
    change — kernels included — invalidates stored executables."""
    global _src_hash_cache
    if _src_hash_cache is not None:
        return _src_hash_cache
    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                h.update(fn.encode())
                with open(os.path.join(dirpath, fn), "rb") as f:
                    h.update(f.read())
    _src_hash_cache = h.hexdigest()
    return _src_hash_cache


def aot_cache_dir() -> str:
    """Artifact directory: ``<compile-cache-dir>/aot`` (machine-local,
    created on demand)."""
    from sde4mbrl_px4_tpu.compile_cache import ensure_compile_cache

    d = os.path.join(ensure_compile_cache(), "aot")
    os.makedirs(d, exist_ok=True)
    return d


def _committed_artifact_dir() -> Optional[str]:
    """Read-only fallback: ``<repo>/artifacts/aot`` in a source checkout.

    Ships the flagship bench executables with the repo so even a FRESH
    machine's first bring-up loads instead of compiling (keys carry the
    package-source hash + jax version + backend fingerprint, so a stale
    commit can never be served — it just misses). New artifacts are
    always written machine-local; this dir is repopulated deliberately
    (commit after the final package change of a round)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if any(os.path.exists(os.path.join(repo, m))
           for m in (".git", "pyproject.toml")):
        d = os.path.join(repo, "artifacts", "aot")
        if os.path.isdir(d):
            return d
    return None


def _backend_fingerprint() -> str:
    try:
        dev = jax.devices()[0]
        return f"{dev.platform}:{getattr(dev, 'device_kind', '?')}:{jax.device_count()}"
    except Exception:  # pragma: no cover — no backend
        return "none"


def load_or_compile(lowered, tag: str = "fn",
                    cache_dir: Optional[str] = None,
                    key_extra: str = "",
                    _force: bool = False):
    """``lowered`` (a ``jax.stages.Lowered``) -> compiled executable,
    via the on-disk artifact when one matches.

    The lowering itself is pure client-side tracing (~2.6 s for the
    flagship mega-kernel program) and doubles as the cache key, so a
    stale artifact can never be served for changed code.

    ``key_extra``: REQUIRED content for any program whose behavior can
    vary with inputs that live ONLY inside a Mosaic kernel body (the
    payloads are stripped from the key): static solver config baked into
    the kernel (max_iter, linesearch scalars, reset_option, ...) leaves
    the surrounding HLO byte-identical, so the caller must fold a
    canonical dump of that config into the key (CompiledMPC passes the
    full solver cfg JSON).

    CPU backend: compiles directly (no artifact). XLA:CPU executables
    embed process-local JIT symbols and fail cross-process
    deserialization ("Function ... not found" at execute); TPU
    executables are self-contained device programs and restore cleanly."""
    from jax.experimental.serialize_executable import (
        deserialize_and_load, serialize)

    # ``_force``: tests only — exercises the artifact machinery on CPU
    # where SAME-process roundtrips do work.
    try:
        if jax.devices()[0].platform == "cpu" and not _force:
            return lowered.compile()
    except Exception:  # pragma: no cover — no backend
        return lowered.compile()

    txt = _PAYLOAD_RE.sub('"<mosaic-payload>"', lowered.as_text())
    key = hashlib.sha256(
        (txt + jax.__version__ + _backend_fingerprint()
         + _package_source_hash() + key_extra).encode()
    ).hexdigest()[:24]
    d = cache_dir or aot_cache_dir()
    path = os.path.join(d, f"{tag}-{key}.aotx")
    committed = _committed_artifact_dir() if cache_dir is None else None
    candidates = [path]
    if committed:
        candidates.append(os.path.join(committed, f"{tag}-{key}.aotx"))
    for cand in candidates:
        if not os.path.exists(cand):
            continue
        try:
            with open(cand, "rb") as f:
                payload, in_tree, out_tree, ndev = pickle.load(f)
            # deserialize_and_load defaults to ALL backend devices; these
            # are single-program executables — restore onto the first
            # ndev devices they were built for (8-virtual-device test
            # meshes would otherwise reject 1-shard arguments).
            return deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=jax.devices()[:ndev])
        except Exception:  # incompatible/corrupt artifact: recompile
            if cand == path:  # never unlink the committed copy
                try:
                    os.remove(path)
                except OSError:
                    pass
    compiled = lowered.compile()
    try:
        ndev = len(compiled.input_shardings[0][0].device_set) if \
            compiled.input_shardings[0] else 1
    except Exception:
        ndev = 1
    try:
        payload, in_tree, out_tree = serialize(compiled)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree, ndev), f)
        os.replace(tmp, path)
    except Exception:  # pragma: no cover — serialization unsupported
        pass
    return compiled
