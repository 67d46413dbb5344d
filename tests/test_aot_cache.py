"""AOT executable cache (aot_cache.py): compile-once/load-forever for the
bring-up path (VERDICT r3 item 1). ``_force=True`` exercises the artifact
machinery on CPU, where same-process roundtrips work (cross-process CPU
deserialization does not — the production gate skips artifacts there)."""
import os

import jax
import jax.numpy as jnp
import numpy as np


def _lowered(scale):
    def f(x):
        def body(c, _):
            return c * scale + 1.0, None
        y, _ = jax.lax.scan(body, x, None, length=8)
        return y
    return jax.jit(f).lower(jnp.zeros((4,)))


def test_roundtrip_and_reload(tmp_path):
    from sde4mbrl_px4_tpu.aot_cache import load_or_compile

    d = str(tmp_path)
    c1 = load_or_compile(_lowered(1.5), tag="t", cache_dir=d, _force=True)
    files = os.listdir(d)
    assert len(files) == 1 and files[0].startswith("t-")
    mt = os.path.getmtime(os.path.join(d, files[0]))

    c2 = load_or_compile(_lowered(1.5), tag="t", cache_dir=d, _force=True)
    assert os.listdir(d) == files                      # hit: no new artifact
    assert os.path.getmtime(os.path.join(d, files[0])) == mt
    x = jnp.arange(4.0)
    np.testing.assert_array_equal(np.asarray(c1(x)), np.asarray(c2(x)))


def test_key_tracks_program_content(tmp_path):
    """A changed program (different constant) must produce a different
    artifact — a stale executable can never be served for changed code."""
    from sde4mbrl_px4_tpu.aot_cache import load_or_compile

    d = str(tmp_path)
    load_or_compile(_lowered(1.5), tag="t", cache_dir=d, _force=True)
    load_or_compile(_lowered(2.5), tag="t", cache_dir=d, _force=True)
    assert len(os.listdir(d)) == 2


def test_corrupt_artifact_recompiled(tmp_path):
    from sde4mbrl_px4_tpu.aot_cache import load_or_compile

    d = str(tmp_path)
    load_or_compile(_lowered(1.5), tag="t", cache_dir=d, _force=True)
    (name,) = os.listdir(d)
    with open(os.path.join(d, name), "wb") as f:
        f.write(b"garbage")
    c = load_or_compile(_lowered(1.5), tag="t", cache_dir=d, _force=True)
    x = jnp.arange(4.0)
    assert np.isfinite(np.asarray(c(x))).all()
    # the corrupt artifact was replaced by a fresh one
    (name2,) = os.listdir(d)
    assert name2 == name
    assert os.path.getsize(os.path.join(d, name2)) > 100


def test_committed_artifacts_fresh_at_head():
    """The committed ``artifacts/aot`` executables must match HEAD
    (VERDICT r4 item 4): their keys embed the package-source hash, so any
    ``.py`` or config edit silently orphans them — fresh-machine bring-up
    would decay from ~10 s to compile-weather minutes with every test
    green. This check turns that red: after changing package source or a
    shipped config, re-run ``python tools/regen_aot_artifacts.py`` on the
    TPU host and commit the refreshed artifacts + MANIFEST.json."""
    from sde4mbrl_px4_tpu.aot_cache import check_committed_fresh

    ok, reason = check_committed_fresh()
    assert ok, reason


def test_manifest_invalidation_surface(tmp_path, monkeypatch):
    """check_committed_fresh flags a source-hash mismatch (simulated by
    regenerating the manifest with a poisoned hash)."""
    import json

    from sde4mbrl_px4_tpu import aot_cache

    d = str(tmp_path / "aot")
    os.makedirs(d)
    aot_cache.write_committed_manifest(d)
    monkeypatch.setattr(aot_cache, "_committed_artifact_dir", lambda: d)
    ok, _ = aot_cache.check_committed_fresh()
    assert ok
    with open(os.path.join(d, "MANIFEST.json")) as f:
        m = json.load(f)
    m["package_source_hash"] = "0" * 64
    with open(os.path.join(d, "MANIFEST.json"), "w") as f:
        json.dump(m, f)
    ok, reason = aot_cache.check_committed_fresh()
    assert not ok and "source changed" in reason


def test_no_committed_env_disables_fallback(monkeypatch):
    """SDE4MBRL_AOT_NO_COMMITTED=1 (set by tools/regen_aot_artifacts.py)
    must disable the committed-dir fallback — without it a regen on
    unchanged source LOADS the artifacts it is about to delete and swaps
    12 files out for 1 (the round-5 near-miss)."""
    from sde4mbrl_px4_tpu import aot_cache

    assert aot_cache._committed_artifact_dir() is not None
    monkeypatch.setenv("SDE4MBRL_AOT_NO_COMMITTED", "1")
    assert aot_cache._committed_artifact_dir() is None


def test_same_key_artifact_shared_across_tags(tmp_path):
    """The key identifies the program; a second tag with the same key is
    served from the first tag's file and writes no duplicate."""
    from sde4mbrl_px4_tpu.aot_cache import load_or_compile

    d = str(tmp_path)
    load_or_compile(_lowered(1.5), tag="alpha", cache_dir=d, _force=True)
    assert len(os.listdir(d)) == 1
    c2 = load_or_compile(_lowered(1.5), tag="beta", cache_dir=d, _force=True)
    assert len(os.listdir(d)) == 1, os.listdir(d)
    x = jnp.arange(4.0)
    assert np.isfinite(np.asarray(c2(x))).all()
