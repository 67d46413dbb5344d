"""PX4 param-dump file support: parse/dump round-trip, diff, bulk push
through the mission layer (reference asset: ``launch/params_hexa_ahg.params``
applied via ``/mavros/param/set``, ``basic_control.py:110-121``)."""
import os

import pytest

from sde4mbrl_px4_tpu.io.px4_params import (
    diff_params,
    dump_params_file,
    parse_params_file,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parse_shipped_asset():
    params = parse_params_file(os.path.join(REPO, "configs", "params_hexa.params"))
    assert params["COM_RCL_EXCEPT"] == 4
    assert isinstance(params["COM_RCL_EXCEPT"], int)  # type code 6 -> int
    assert params["MPC_TILTMAX_AIR"] == pytest.approx(30.0)
    assert isinstance(params["MPC_TILTMAX_AIR"], float)  # type code 9 -> float
    assert len(params) == 9


def test_roundtrip(tmp_path):
    src = {"A_INT": 4, "B_FLOAT": 0.5, "C_NEG": -1, "D_BIG": 921600}
    p = str(tmp_path / "dump.params")
    dump_params_file(p, src, header="roundtrip test")
    back = parse_params_file(p)
    assert back == src
    for k in ("A_INT", "C_NEG", "D_BIG"):
        assert isinstance(back[k], int)
    assert isinstance(back["B_FLOAT"], float)


def test_int_fidelity_and_numpy_types(tmp_path):
    import numpy as np

    # 64-bit int params survive exactly (no float round-trip > 2^53)
    p = tmp_path / "big.params"
    p.write_text("1\t1\tBIG64\t9007199254740993\t8\n1\t1\tEXP\t4.000000\t6\n")
    d = parse_params_file(str(p))
    assert d["BIG64"] == 9007199254740993
    assert d["EXP"] == 4 and isinstance(d["EXP"], int)
    # fractional value on an int-typed line is an error, not a truncation
    p.write_text("1\t1\tX\t4.7\t6\n")
    with pytest.raises(ValueError, match="fractional"):
        parse_params_file(str(p))
    # numpy integer values keep the integer firmware type on dump
    out = str(tmp_path / "np.params")
    dump_params_file(out, {"RATE": np.int32(921600), "GAIN": np.float32(0.5)})
    back = parse_params_file(out)
    assert back["RATE"] == 921600 and isinstance(back["RATE"], int)
    assert isinstance(back["GAIN"], float)


def test_duplicate_conflict_raises(tmp_path):
    p = tmp_path / "dup.params"
    # same param on two components with different values: refuse
    p.write_text("1\t1\tBAT1_N_CELLS\t4\t6\n1\t2\tBAT1_N_CELLS\t6\t6\n")
    with pytest.raises(ValueError, match="duplicate"):
        parse_params_file(str(p))
    # exact repeat is harmless
    p.write_text("1\t1\tBAT1_N_CELLS\t4\t6\n1\t1\tBAT1_N_CELLS\t4\t6\n")
    assert parse_params_file(str(p)) == {"BAT1_N_CELLS": 4}


def test_parse_rejects_malformed(tmp_path):
    p = tmp_path / "bad.params"
    p.write_text("1\t1\tNAME_ONLY\n")
    with pytest.raises(ValueError, match="expected 5 fields"):
        parse_params_file(str(p))
    p.write_text("1\t1\tX\tnotanumber\t9\n")
    with pytest.raises(ValueError):
        parse_params_file(str(p))


def test_diff_params():
    cur = {"A": 1, "B": 2.0, "C": 3}
    tgt = {"A": 1, "B": 2.5, "D": 4}
    d = diff_params(cur, tgt)
    assert set(d) == {"B", "D"}
    assert d["B"] == (2.0, 2.5)
    assert d["D"] == (None, 4)
    # float equality within rtol is NOT a diff
    assert diff_params({"X": 1.0}, {"X": 1.0 + 1e-9}) == {}


def test_full_vehicle_dump_asset(tmp_path):
    """The committed full-surface dump (``configs/params_hexa_full.params``,
    the framework's analogue of the reference's 1073-line
    ``launch/params_hexa_ahg.params``): several hundred params, regenerable
    bit-for-bit from tools/gen_px4_params.py, consistent with the preflight
    push subset, and diffable."""
    full_path = os.path.join(REPO, "configs", "params_hexa_full.params")
    full = parse_params_file(full_path)
    assert len(full) >= 400, len(full)
    # hexa identity + the MPC-offboard essentials are in the full surface
    assert full["SYS_AUTOSTART"] == 6001
    assert full["COM_RCL_EXCEPT"] == 4
    assert full["SER_TEL2_BAUD"] == 921600          # router_hexa.conf UART
    assert full["BAT1_N_CELLS"] == 6
    assert isinstance(full["MPC_XY_VEL_MAX"], float)

    # the 17-line preflight subset must be consistent with the full dump on
    # every shared key (diff restricted to the overlap is empty)
    subset = parse_params_file(os.path.join(REPO, "configs", "params_hexa.params"))
    overlap = {k: full[k] for k in subset if k in full}
    assert len(overlap) >= 5
    conflicting = diff_params(overlap, {k: subset[k] for k in overlap})
    assert conflicting == {}, conflicting

    # a fresh stock vehicle (PX4 defaults) diffs against the dump into a
    # non-trivial push set that INCLUDES the offboard-critical overrides
    stock = dict(full)
    stock["COM_RCL_EXCEPT"] = 0
    stock["MAV_1_MODE"] = 0
    del stock["SER_TEL2_BAUD"]
    d = diff_params(stock, full)
    assert set(d) == {"COM_RCL_EXCEPT", "MAV_1_MODE", "SER_TEL2_BAUD"}

    # regeneration is deterministic (the asset is reviewable, not a blob)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_px4_params", os.path.join(REPO, "tools", "gen_px4_params.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "regen.params")
    mod.main(out)
    assert open(out).read() == open(full_path).read()


def test_mission_push_full_dump(iris_model, tmp_path):
    """push_params applied to the FULL vehicle dump: every param lands on
    the FCU param surface (the reference pushes params one service call at
    a time, ``basic_control.py:147-149`` — bulk push is the same verb)."""
    from sde4mbrl_px4_tpu.cli.mission import MissionControl, SimVehicle, dispatch
    from sde4mbrl_px4_tpu.sim.plant import FCUSim, SDEPlant

    model, params = iris_model
    fcu = FCUSim(SDEPlant(model, params, sim_dt=0.005))
    ctl = MissionControl(SimVehicle(fcu), engine=None, log=lambda *a: None)
    full_path = os.path.join(REPO, "configs", "params_hexa_full.params")
    assert dispatch(ctl, f"push_params {full_path}")
    full = parse_params_file(full_path)
    assert len(fcu.params) >= len(full)
    assert fcu.params["SYS_AUTOSTART"] == 6001
    assert fcu.params["EKF2_HGT_MODE"] == 3
    assert fcu.params["MPC_THR_HOVER"] == pytest.approx(0.42)


def test_mission_push_params(iris_model, tmp_path):
    from sde4mbrl_px4_tpu.cli.mission import MissionControl, SimVehicle, dispatch
    from sde4mbrl_px4_tpu.sim.plant import FCUSim, SDEPlant

    model, params = iris_model
    fcu = FCUSim(SDEPlant(model, params, sim_dt=0.005))
    veh = SimVehicle(fcu)
    logs = []
    ctl = MissionControl(veh, engine=None, log=logs.append)

    pfile = str(tmp_path / "mission.params")
    dump_params_file(pfile, {"MPC_TILTMAX_AIR": 25.0, "NAV_RCL_ACT": 0})

    # through the REPL grammar (path arg stays a string)
    assert dispatch(ctl, f"push_params {pfile}")
    assert fcu.params["MPC_TILTMAX_AIR"] == pytest.approx(25.0)
    assert fcu.params["NAV_RCL_ACT"] == 0
    # preflight push from __init__ is still there
    assert fcu.params["COM_RCL_EXCEPT"] == 4
    assert any("Pushed 2/2" in str(m) for m in logs)
