"""Data-generation tooling (Fluent scheme + ICEM mesh parametrization)."""

from cfdbench_tpu.generation.fluent import (
    build_cases,
    cavity_sweep,
    expand_template,
    step_sweep,
)
from cfdbench_tpu.generation.icem import barrier_grid, expand_rpl, mesh_params


def test_expand_template():
    t = "read {mesh}\nset rho {density}\nsave {save_path}/{case_name}\n"
    out = expand_template(
        t, dict(mesh="m.msh", density=1.5, save_path="/x", case_name="c.h5")
    )
    assert "read m.msh" in out
    assert "set rho 1.5" in out
    assert "save /x/c.h5" in out


def test_cavity_sweep_counts():
    s = cavity_sweep()
    # 50 bc cases + 84 prop cases (README.md:59-84 case counts)
    assert len(s["velocity"]) == 134
    assert s["velocity"][0] == 1.0 and s["velocity"][49] == 50.0
    assert len(set(zip(s["density"][50:], s["viscosity"][50:]))) == 84


def test_step_sweep_counts():
    s = step_sweep()
    assert len(s["velocity"]) == 170  # 70 bc + 100 prop


def test_build_cases():
    cases = build_cases("cavity", "/m/case{case}.msh", "/out", count=3)
    assert len(cases) == 3
    assert cases[1]["old_var"] == "export-0"
    assert cases[1]["new_var"] == "export-1"
    assert cases[2]["mesh"] == "/m/case2.msh"


def test_icem_mesh_params():
    p = mesh_params(0.12, 0.05)
    assert p["point9"] == (0.55, 0.12, 0.0)
    assert p["nodes_x1"] == 6  # 0.05/0.01 + 1
    assert p["nodes_y2"] == 89  # (1-0.12)/0.01 + 1
    assert len(barrier_grid()) == 50


def test_expand_rpl():
    t = "point {point7}\nnx {nodes_x1}\nname {project_name}"
    out = expand_rpl(t, 0.11, 0.01, "proj3")
    assert "point 0 0.11 0" in out
    assert "nx 2" in out
    assert "name proj3" in out
