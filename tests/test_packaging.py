"""Packaging metadata sanity: pyproject.toml parses, its version matches
the package, and every declared console-script target exists.

The reference ships only a defective requirements.txt
(``/root/reference/requirements.txt:1-7``; README install line missing
``.txt`` and half the generative deps absent — SURVEY.md §8 defect #14);
this framework is a real installable package instead.
"""

import importlib
import tomllib
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_pyproject_parses_and_version_matches():
    proj = _load()["project"]
    import cfdbench_tpu

    assert proj["version"] == cfdbench_tpu.__version__
    assert proj["name"] == "cfdbench-tpu"


def test_console_script_targets_exist():
    proj = _load()["project"]
    for name, target in proj["scripts"].items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_declared_dependencies_are_importable():
    # The baked-in environment must satisfy the required deps (the
    # optional extras are allowed to be absent).
    proj = _load()["project"]
    for dep in proj["dependencies"]:
        mod = dep.split(">=")[0].split("==")[0].strip()
        importlib.import_module(mod)


def test_native_source_is_package_data():
    cfg = _load()["tool"]["setuptools"]["package-data"]
    assert "*.cc" in cfg["cfdbench_tpu.native"]
    assert (REPO / "cfdbench_tpu" / "native" / "npy_reader.cc").exists()
