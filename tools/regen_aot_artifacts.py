#!/usr/bin/env python
"""Regenerate the committed AOT executables in ``artifacts/aot/``.

The committed artifacts let a FRESH machine bring the flagship engines up
in ~10 s instead of compile-weather minutes (aot_cache.py). Their cache
keys embed the package-source hash + jax version + full solver-config
JSON, so ANY ``.py`` or config edit orphans them silently — this tool is
the one deliberate regeneration step, and it writes the MANIFEST.json
that ``aot_cache.check_committed_fresh()`` (preflight / bench /
tests/test_aot_cache.py) validates at HEAD.

Run on the TPU host after the LAST package/config change of a round:

    python tools/regen_aot_artifacts.py

Covers exactly the executables flagship bring-up + bench.py load:
- CompiledMPC (tags mpc/reset/sft) for iris+hexa × traj+posctrl;
- bench.py's ``bench_reset``/``bench_mpc`` pair (iris traj, lowered at
  the bench's own example state).
"""
import os
import shutil
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)

from sde4mbrl_px4_tpu.compile_cache import ensure_compile_cache  # noqa: E402

ensure_compile_cache()


def main():
    import jax

    assert jax.devices()[0].platform != "cpu", (
        "committed AOT artifacts are TPU executables — run this on the "
        "TPU host (CPU executables embed process-local JIT symbols and "
        "cannot be shipped)")

    final_dir = os.path.join(_ROOT, "artifacts", "aot")
    tmp_dir = tempfile.mkdtemp(prefix="aot_regen_")
    # All load_or_compile() calls below write HERE; the committed-dir
    # fallback is disabled so a regen on UNCHANGED source still compiles
    # fresh copies instead of loading (then deleting) the files it is
    # replacing.
    os.environ["SDE4MBRL_AOT_DIR"] = tmp_dir
    os.environ["SDE4MBRL_AOT_NO_COMMITTED"] = "1"

    import json
    import time

    import jax.numpy as jnp

    from sde4mbrl_px4_tpu.aot_cache import (load_or_compile,
                                            write_committed_manifest)
    from sde4mbrl_px4_tpu.core.frames import enu2ned
    from sde4mbrl_px4_tpu.engine.controller import CompiledMPC
    from sde4mbrl_px4_tpu.engine.mpc_loader import load_mpc_from_cfgfile

    t0 = time.time()
    for name in ("iris_traj_mpc", "iris_posctrl_mpc",
                 "hexa_traj_mpc", "hexa_posctrl_mpc"):
        t1 = time.time()
        CompiledMPC(os.path.join(_ROOT, "configs", f"{name}.yaml"))
        print(f"{name}: compiled+serialized in {time.time()-t1:.1f}s",
              flush=True)

    # bench.py's own pair (tags bench_reset/bench_mpc, lowered at the
    # bench's example state — same shapes, distinct tags).
    t1 = time.time()
    cfg, (reset_fn, mpc_fn), sft, _ = load_mpc_from_cfgfile(
        os.path.join(_ROOT, "configs", "iris_traj_mpc.yaml"))
    cfg_key = json.dumps(cfg, sort_keys=True, default=str)
    jx = load_or_compile(
        jax.jit(lambda t: enu2ned(sft(t))).lower(jnp.float32(3.0)),
        tag="bench_sft", key_extra=cfg_key)
    x = jx(jnp.float32(3.0))
    rng = jax.random.PRNGKey(0)
    jr = load_or_compile(jax.jit(reset_fn).lower(x, rng, x),
                         tag="bench_reset", key_extra=cfg_key)
    st = jr(x, rng, x)
    load_or_compile(jax.jit(mpc_fn).lower(x, rng, st, jnp.float32(3.0), x),
                    tag="bench_mpc", key_extra=cfg_key)
    print(f"bench pair: {time.time()-t1:.1f}s", flush=True)

    # Swap in atomically-ish: clear old committed artifacts, move new ones.
    os.makedirs(final_dir, exist_ok=True)
    for fn in os.listdir(final_dir):
        if fn.endswith(".aotx") or fn == "MANIFEST.json":
            os.remove(os.path.join(final_dir, fn))
    n = 0
    for fn in sorted(os.listdir(tmp_dir)):
        if fn.endswith(".aotx"):
            shutil.move(os.path.join(tmp_dir, fn),
                        os.path.join(final_dir, fn))
            n += 1
    mpath = write_committed_manifest(final_dir)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    print(f"regenerated {n} artifacts into {final_dir} in "
          f"{time.time()-t0:.1f}s; manifest: {mpath}", flush=True)

    from sde4mbrl_px4_tpu.aot_cache import check_committed_fresh

    # restore the committed-dir fallback for the self-check
    os.environ.pop("SDE4MBRL_AOT_NO_COMMITTED", None)
    ok, reason = check_committed_fresh()
    assert ok, f"freshness self-check failed after regen: {reason}"
    print("freshness self-check: OK", flush=True)


if __name__ == "__main__":
    main()
