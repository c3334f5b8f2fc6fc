"""Packaging metadata sanity.

The reference ships only a requirements.txt (no installable package); the
rebuild is a proper package (pyproject.toml, console scripts, native source
shipped as package data). These tests keep the metadata in sync with the
code without running pip.
"""

from __future__ import annotations

import importlib
import pathlib
import tomllib

REPO = pathlib.Path(__file__).resolve().parent.parent


def _project():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)["project"]


def test_console_scripts_resolve():
    for target in _project()["scripts"].values():
        mod, func = target.split(":")
        assert callable(getattr(importlib.import_module(mod), func))


def test_version_matches_package():
    import vfi_tpu

    assert _project()["version"] == vfi_tpu.__version__


def test_native_source_is_package_data():
    # build.py compiles vfi_io.cpp on first use; the wheel must carry it.
    assert (REPO / "vfi_tpu" / "native" / "vfi_io.cpp").is_file()
    with open(REPO / "pyproject.toml", "rb") as f:
        data = tomllib.load(f)
    pkg_data = data["tool"]["setuptools"]["package-data"]["vfi_tpu.native"]
    assert "vfi_io.cpp" in pkg_data


def test_requirements_mirror_pyproject():
    deps = {
        d.split(">=")[0].strip()
        for d in _project()["dependencies"]
    }
    reqs = {
        line.split(">=")[0].strip()
        for line in (REPO / "requirements.txt").read_text().splitlines()
        if line and not line.startswith("#")
    }
    assert deps == reqs
