"""Packaging surface (reference GAN-Based-SR/setup.py): pyproject metadata is
well-formed, the dynamic version resolves, every console-script target
imports and is callable, and the bundled data files exist."""
import importlib
import os

import tomllib

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_pyproject_parses_and_version_resolves():
    cfg = _load()
    assert cfg["project"]["name"] == "ssl_tpu"
    attr = cfg["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    mod_name, _, attr_name = attr.rpartition(".")
    mod = importlib.import_module(mod_name)
    ver = getattr(mod, attr_name)
    assert isinstance(ver, str) and ver.count(".") >= 1


def test_console_scripts_import_and_are_callable():
    cfg = _load()
    scripts = cfg["project"]["scripts"]
    assert set(scripts) >= {"ssl-train", "ssl-test", "ssl-diffusion-train",
                            "ssl-diffusion-test", "ssl-cfw-train"}
    for name, target in scripts.items():
        mod_name, _, fn_name = target.partition(":")
        fn = getattr(importlib.import_module(mod_name), fn_name)
        assert callable(fn), name


def test_package_data_files_exist():
    cfg = _load()
    for pkg, globs in cfg["tool"]["setuptools"]["package-data"].items():
        pkg_dir = os.path.join(ROOT, *pkg.split("."))
        for pattern in globs:
            import glob as _g
            assert _g.glob(os.path.join(pkg_dir, pattern)), (pkg, pattern)
