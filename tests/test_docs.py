"""Mechanical doc/asset lockstep checks (VERDICT r4 item 8).

Round 3 flagged a stale bench number in the README and the config-sha
mechanism fixed that class; round 4 found the same rot in an ASSET
inventory (README said "503 params" while the shipped dump had 1,177).
These tests derive the inventory numbers from the shipped files and
fail when any doc quotes a different value — docs can no longer
silently diverge from the artifacts they describe.
"""
import os
import re

import yaml

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _param_count(path):
    """Parameters in a PX4 param dump: non-comment, non-blank lines."""
    with open(path) as f:
        return sum(1 for ln in f if ln.strip() and not ln.startswith("#"))


def test_param_dump_count_matches_docs():
    n = _param_count(os.path.join(_ROOT, "configs", "params_hexa_full.params"))
    quoted = f"{n:,}"  # docs quote it with a thousands separator
    for doc in ("README.md", os.path.join("docs", "MIGRATION.md")):
        with open(os.path.join(_ROOT, doc)) as f:
            text = f.read()
        assert f"{quoted}-param" in text or f"{quoted} params" in text, (
            f"{doc} does not quote the actual param-dump size {quoted}; "
            "regenerate the dump or fix the doc")
        # No OTHER "<number> params"-style claim about the full dump may
        # survive: any 3-4 digit count that is not the real one is rot.
        for m in re.finditer(r"([\d,]{3,5})[- ]param", text):
            val = int(m.group(1).replace(",", ""))
            assert val in (n, 1073), (
                f"{doc} quotes a param count {val} that is neither the "
                f"shipped dump's ({n}) nor the reference's real-vehicle "
                "dump (1,073)")


def test_shipped_checkpoints_exist_and_are_reachable():
    """Every checkpoint the configs reference must ship, and every
    shipped checkpoint must be REACHABLE — either named by a config's
    ``learned_model_params`` or loadable through the policy solver's
    ``{vehicle}_{traj|posctrl}_policy.pkl`` naming convention. A stray
    .pkl that nothing can load is inventory rot."""
    mdl_dir = os.path.join(_ROOT, "configs", "models")
    shipped = sorted(f for f in os.listdir(mdl_dir) if f.endswith(".pkl"))
    assert shipped, "no shipped checkpoints found"
    referenced = set()
    for cfg_name in os.listdir(os.path.join(_ROOT, "configs")):
        if not cfg_name.endswith(".yaml"):
            continue
        with open(os.path.join(_ROOT, "configs", cfg_name)) as f:
            cfg = yaml.safe_load(f)
        if isinstance(cfg, dict) and cfg.get("learned_model_params"):
            p = os.path.join(_ROOT, "configs", cfg["learned_model_params"])
            assert os.path.exists(p), (
                f"{cfg_name} references missing checkpoint "
                f"{cfg['learned_model_params']}")
            referenced.add(os.path.basename(p))
    convention = re.compile(r"^(iris|hexa)_(traj|posctrl)_policy\.pkl$")
    for f in shipped:
        assert f in referenced or convention.match(f), (
            f"shipped checkpoint {f} is reachable by neither a config's "
            "learned_model_params nor the policy-solver naming convention")


def test_readme_config_sha_matches_configs():
    """The README quotes bench numbers next to a config fingerprint; the
    fingerprint in the text must match the shipped config (bench.py
    computes the same sha)."""
    import hashlib

    with open(os.path.join(_ROOT, "configs", "iris_traj_mpc.yaml"), "rb") as f:
        sha = hashlib.sha256(f.read()).hexdigest()[:12]
    with open(os.path.join(_ROOT, "README.md")) as f:
        text = f.read()
    quoted = re.findall(r"config_sha [`\"]?([0-9a-f]{12})", text)
    assert quoted, "README no longer quotes a config_sha next to its numbers"
    for q in quoted:
        assert q == sha, (
            f"README quotes config_sha {q} but configs/iris_traj_mpc.yaml "
            f"hashes to {sha}: the config changed after the doc was "
            "written — re-run bench.py and refresh the quoted numbers")
