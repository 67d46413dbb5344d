"""Model checkpoint IO (L1).

The reference names a pickled learned-parameter file in its MPC config
(``learned_model_params: .../iris_sitl_sde.pkl``,
``launch/iris_sitl_traj_mpc.yaml:3``) and loads it inside the external
library. Here checkpoints are pickles of
``{"meta": {...}, "params": <pytree of np arrays>}`` — numpy on disk
(device-independent), promoted to jnp on load.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Tuple

import jax
import numpy as np

__all__ = ["save_params", "load_params", "expand_user"]


def expand_user(path: str) -> str:
    """``~`` expansion (the reference does this in C++ at
    ``geometric_controller.cpp:6-22`` and via shell elsewhere)."""
    return os.path.expanduser(path)


def save_params(path: str, params: Dict[str, Any], meta: Dict[str, Any] | None = None) -> None:
    path = expand_user(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_params = jax.tree.map(np.asarray, params)
    with open(path, "wb") as f:
        pickle.dump({"meta": dict(meta or {}), "params": host_params}, f)


def load_params(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns ``(params, meta)``. Accepts both this framework's layout and a
    bare parameter pytree (meta defaults to {})."""
    path = expand_user(path)
    with open(path, "rb") as f:
        blob = pickle.load(f)
    if isinstance(blob, dict) and "params" in blob:
        return blob["params"], blob.get("meta", {})
    return blob, {}
