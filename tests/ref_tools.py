"""Shared scaffolding for importing the reference's tools/*.py modules.

The reference's train/eval tools (tools/train_YCBV_stage1.py,
tools/test_YCBV_stage1.py, ...) only define functions/classes at module
level but import CUDA-era environment packages. One stub set serves every
golden test that needs them (test_golden_metrics.py, test_golden_train.py);
the model/data golden modules keep their own richer stub installers
(test_golden_reference._install_reference_stubs, test_golden_data).
"""

import importlib.util
import os
import sys
import types

import pytest

REF_ROOT = "/root/reference"


def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    m.__path__ = []
    sys.modules[name] = m
    return m


def install_tool_stubs():
    """Stubs for the reference tools' module-level imports: open3d, tqdm,
    gorilla (incl. gorilla.solver.BaseSolver — tools subclass it at import
    time), tensorboardX (pulled in via utils.tools_train)."""
    for name in ("open3d", "tqdm"):
        if name not in sys.modules:
            _module(name)
    g = sys.modules.get("gorilla") or _module("gorilla")
    if not hasattr(g, "solver"):
        g.solver = types.SimpleNamespace(BaseSolver=object)
    if "tensorboardX" not in sys.modules:
        class _NoWriter:
            def __init__(self, *a, **kw):
                pass

        _module("tensorboardX", SummaryWriter=_NoWriter)


def import_ref_tool(relpath, name):
    """Import a reference tools/*.py file as `name` with stubs installed;
    skips the calling test when the reference checkout is absent."""
    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference checkout not available")
    install_tool_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_ROOT, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def compile_reference_driver(tmp_path_factory, driver_cc, include_dirs, name):
    """Compile a tests/golden_cpp driver against the reference's own C++
    sources into a ctypes CDLL; skips when the checkout or g++ is absent.

    One shared implementation so compile flags / stub include paths cannot
    silently diverge between the rulebook and voxelize fixtures.
    """
    import ctypes
    import shutil
    import subprocess

    for d in include_dirs:
        if not os.path.isdir(str(d)):
            pytest.skip(f"{d} not available")
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    so = tmp_path_factory.mktemp(name) / f"{name}.so"
    stubs = os.path.join(os.path.dirname(__file__), "golden_cpp", "stubs")
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++14"]
    cmd += [f"-I{d}" for d in list(include_dirs) + [stubs]]
    cmd += [str(driver_cc), "-o", str(so)]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.fail(f"reference {name} build failed:\n{proc.stderr}")
    return ctypes.CDLL(str(so))
