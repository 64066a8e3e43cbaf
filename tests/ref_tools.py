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
import re
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


# `kernel<<<grid, block[, smem[, stream]]>>>(args)` — the CUDA launch
# syntax, the ONLY construct in the reference .cu files g++ cannot parse.
# The name may be namespace-qualified and templated; the launch config may
# span lines (hence DOTALL) but contains no `>>>` of its own.
_CUDA_LAUNCH_RE = re.compile(
    r"([A-Za-z_][A-Za-z_0-9:]*(?:\s*<[^<>]*>)?)\s*<<<(.*?)>>>\s*\(",
    re.DOTALL,
)


def serialize_cuda_source(src_path, dst_path):
    """Copy a reference .cu file, rewriting ONLY the `<<<...>>>` launch
    statements to `CUDA_LAUNCH(grid, block, ...)(kernel, args...)` so the
    file compiles as plain C++ against stubs/cuda_serial.h. Kernel bodies and
    launch configurations stay byte-identical; returns the rewrite count so
    tests can assert the transform actually matched."""
    text = open(src_path).read()
    xformed, n_subs = _CUDA_LAUNCH_RE.subn(r"CUDA_LAUNCH(\2)(\1, ", text)
    with open(dst_path, "w") as f:
        f.write(xformed)
    return n_subs


def compile_cuda_driver(tmp_path_factory, driver_cc, cu_sources,
                        include_dirs, name):
    """Compile a golden driver around reference .cu kernels run serially.

    cu_sources: {include_name: reference_path} — each file is copied through
    serialize_cuda_source into a temp include dir the driver sees first on
    the include path.
    """
    xdir = tmp_path_factory.mktemp(f"{name}_cu")
    for inc_name, src in cu_sources.items():
        if not os.path.isfile(str(src)):
            pytest.skip(f"{src} not available")
        assert serialize_cuda_source(str(src), str(xdir / inc_name)) > 0, (
            f"no CUDA launches found in {src}; transform regex out of date?")
    return compile_reference_driver(
        tmp_path_factory, driver_cc, [xdir] + list(include_dirs), name)
