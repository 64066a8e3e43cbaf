"""AOT serving artifacts via jax.export (StableHLO).

The reference has no deployment story: serving its model means shipping the
full torch codebase, the compiled spconv/pointgroup/pointnet CUDA
extensions, the YAML config, and the ``.pth`` checkpoint, then driving
``tools/test_YCBV_stage1.py``-style scripts (reference
tools/test_YCBV_stage1.py:127-205). Here the trained stage-1 eval forward
is packaged as ONE self-contained artifact:

- the weights AND the per-class template cache are baked in as constants —
  the template branch depends only on the CAD cloud, so it is encoded once
  at export time (the same reuse the evaluator's template cache exploits,
  eval/evaluator.py);
- the serving input is ``(feats [B,N,7] f32, voxel_idx [B,N,3] i32,
  obj_idx [B] i32)`` — exactly the per-instance tensors the test datasets
  emit (data/schema.py);
- the output is ``{"rot_pred" [B,3,3], "trans_pred" [B,3],
  "conf" [B,N+M]}``;
- :func:`load_serve` deserializes and returns a callable. The serving site
  needs jax with a matching backend — no dcl_net_tpu code, config, or
  checkpoint.

Multi-device: passing ``mesh=`` to the export functions (CLI:
``--n_devices``) produces a data-parallel artifact — batch sharded over a
1-D mesh, weights replicated by GSPMD — that must be served on the same
device count.

Platform notes: ``platforms=("tpu",)`` bakes the production fast paths
(Pallas matmul voxelizer / fused interp under bf16) into a TPU-only
artifact; a portable artifact (``("cpu", "tpu")``) must be exported from a
model configured with the exact XLA paths (``interp_mode="exact"``,
``voxelize_impl="scatter"``) since the Pallas kernels only lower for TPU.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def encode_template_cache(model, variables, bank: Dict[str, object]):
    """Encode the per-class CAD template bank once (eval semantics).

    bank: {"feats": [C, M, 7], "voxel_idx": [C, M, 3]} as produced by the
    datasets' ``template_bank()``.
    """
    inputs = {"tmp": {
        "feats": jnp.asarray(bank["feats"]),
        "voxel_idx": jnp.asarray(bank["voxel_idx"]),
    }}
    return jax.jit(
        lambda v, b: model.apply(v, b, train=False,
                                 method=model.encode_template)
    )(variables, inputs)


def make_serve_fn(model, variables, tmp_cache):
    """Build the serving closure: (feats, voxel_idx, obj_idx) -> poses.

    Weights and the template cache are closed over, so ``jax.export``
    embeds them as constants in the artifact.
    """

    def serve(feats, voxel_idx, obj_idx):
        batch = {"inp": {"feats": feats, "voxel_idx": voxel_idx}}
        obs = model.apply(variables, batch, train=False,
                          method=model.encode_observed)
        tmp = jax.tree.map(lambda x: x[obj_idx], tmp_cache)
        out = model.apply(variables, obs, tmp, train=False,
                          method=model.fuse)
        return {
            "rot_pred": out["rot_pred"],
            "trans_pred": out["trans_pred"],
            "conf": out["conf"],
            # [B] bool: the sample's occupied voxels exceeded a static
            # extraction capacity and were partially dropped — the pose may
            # be degraded (models/backbone.py). The serving site should
            # surface/requeue these rather than trust them silently.
            "overflow": out["overflow"],
        }

    return serve


def _export(serve, model, batch_size, platforms, mesh):
    """jax.export the serving closure; with a mesh, the artifact is a
    data-parallel program (batch sharded over the mesh, weights replicated
    by GSPMD) that must be loaded on the same device count.

    ``batch_size=None`` exports a BATCH-POLYMORPHIC artifact (symbolic
    batch dimension via jax.export shape polymorphism): one artifact serves
    any batch size, recompiling per size at the serving site. Requires the
    portable XLA paths (exact interp + scatter voxelize — the Pallas
    kernels compute their grids from concrete shapes) and no mesh (a
    sharded program needs a concrete divisible batch)."""
    n = int(model.n_inp)
    if batch_size is None:
        if mesh is not None:
            raise ValueError("polymorphic batch cannot be combined with a "
                             "mesh-sharded artifact")
        (B,) = jax.export.symbolic_shape("B")
        specs = (
            jax.ShapeDtypeStruct((B, n, 7), jnp.float32),
            jax.ShapeDtypeStruct((B, n, 3), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        )
        exported = jax.export.export(
            jax.jit(serve),
            platforms=list(platforms) if platforms is not None else None,
        )(*specs)
        return exported.serialize()
    if mesh is not None:
        from dcl_net_tpu.parallel.mesh import batch_sharding

        shard = batch_sharding(mesh)
        if batch_size % mesh.size:
            raise ValueError(
                f"batch {batch_size} not divisible by mesh size {mesh.size}")
        specs = (
            jax.ShapeDtypeStruct((batch_size, n, 7), jnp.float32, sharding=shard),
            jax.ShapeDtypeStruct((batch_size, n, 3), jnp.int32, sharding=shard),
            jax.ShapeDtypeStruct((batch_size,), jnp.int32, sharding=shard),
        )
        fn = jax.jit(serve, in_shardings=(shard,) * 3,
                     out_shardings=shard)
    else:
        specs = (
            jax.ShapeDtypeStruct((batch_size, n, 7), jnp.float32),
            jax.ShapeDtypeStruct((batch_size, n, 3), jnp.int32),
            jax.ShapeDtypeStruct((batch_size,), jnp.int32),
        )
        fn = jax.jit(serve)
    exported = jax.export.export(
        fn, platforms=list(platforms) if platforms is not None else None,
    )(*specs)
    return exported.serialize()


def export_serve(
    model,
    variables,
    bank: Dict[str, object],
    batch_size: Optional[int],
    platforms: Optional[Sequence[str]] = None,
    mesh=None,
) -> bytes:
    """Export the stage-1 serving function to portable StableHLO bytes.

    ``batch_size=None`` -> batch-polymorphic artifact (see :func:`_export`).
    """
    tmp_cache = encode_template_cache(model, variables, bank)
    serve = make_serve_fn(model, variables, tmp_cache)
    return _export(serve, model, batch_size, platforms, mesh)


def make_serve_fn_stage2(model, variables, refiner, refiner_variables,
                         tmp_cache, iterations: int):
    """Stage-1 + iterative refiner serving closure (the full two-stage
    inference pipeline the reference drives from tools/test_YCBV_stage2.py:
    140-260, as one graph). Same input signature as stage 1; the output
    poses are the refined ones (stage-1 poses included for diagnostics)."""
    from dcl_net_tpu.models.refiner import refine_pose

    def serve(feats, voxel_idx, obj_idx):
        batch = {"inp": {"feats": feats, "voxel_idx": voxel_idx}}
        obs = model.apply(variables, batch, train=False,
                          method=model.encode_observed)
        tmp = jax.tree.map(lambda x: x[obj_idx], tmp_cache)
        out = model.apply(variables, obs, tmp, train=False,
                          method=model.fuse)
        rot, trans = refine_pose(
            refiner.apply, refiner_variables,
            out["points_inp"], out["F_Xo_p"], out["conf"],
            out["rot_pred"], out["trans_pred"], iterations,
        )
        return {
            "rot_pred": rot,
            "trans_pred": trans,
            "conf": out["conf"],
            "overflow": out["overflow"],     # see make_serve_fn
            "rot_stage1": out["rot_pred"],
            "trans_stage1": out["trans_pred"],
        }

    return serve


def export_serve_stage2(
    model,
    variables,
    refiner,
    refiner_variables,
    bank: Dict[str, object],
    batch_size: Optional[int],
    iterations: int = 2,
    platforms: Optional[Sequence[str]] = None,
    mesh=None,
) -> bytes:
    """Export the refined (stage-1 + stage-2) serving function.

    ``batch_size=None`` -> batch-polymorphic artifact (see :func:`_export`).
    """
    tmp_cache = encode_template_cache(model, variables, bank)
    serve = make_serve_fn_stage2(model, variables, refiner,
                                 refiner_variables, tmp_cache, iterations)
    return _export(serve, model, batch_size, platforms, mesh)


# ---------------------------------------------------------------------------
# Artifact bundles: fixed-batch fast artifacts + a poly catch-all
# ---------------------------------------------------------------------------
BUNDLE_MANIFEST = "manifest.json"


def export_bundle(
    model,
    variables,
    bank: Dict[str, object],
    batch_sizes: Sequence[int] = (1, 16, 64, 512),
    include_poly: bool = True,
    poly_model=None,
    platforms: Optional[Sequence[str]] = None,
) -> Dict[str, bytes]:
    """Export a SET of serving artifacts: one fixed-batch artifact per size
    in `batch_sizes` (these keep whatever fast paths `model` is configured
    with — Pallas interp + matmul voxelizer in production) plus an optional
    batch-polymorphic catch-all.

    The poly artifact cannot carry the Pallas kernels (they compute their
    grids from concrete shapes), so callers on the TPU fast-path config pass
    `poly_model`: the same architecture configured with the portable XLA
    paths (interp_mode="exact", voxelize_impl="scatter") — weights are
    shared, only the op implementations differ. When `model` already uses
    the portable paths, poly_model can be omitted.

    Returns {name: serialized artifact bytes}; see save_bundle / BundleServer.
    """
    template_cache = encode_template_cache(model, variables, bank)
    out: Dict[str, bytes] = {}
    for b in batch_sizes:
        serve = make_serve_fn(model, variables, template_cache)
        out[f"b{int(b):05d}"] = _export(serve, model, int(b), platforms, None)
    if include_poly:
        pm = poly_model if poly_model is not None else model
        cache = (template_cache if pm is model
                 else encode_template_cache(pm, variables, bank))
        serve = make_serve_fn(pm, variables, cache)
        out["poly"] = _export(serve, pm, None, platforms, None)
    return out


def save_bundle(dirpath: str, artifacts: Dict[str, bytes]) -> str:
    """Write a bundle directory: one .stablehlo per artifact + manifest.json
    mapping names to files and batch sizes. Returns the manifest path."""
    os.makedirs(dirpath, exist_ok=True)
    manifest = {"artifacts": {}}
    for name, data in artifacts.items():
        fname = f"{name}.stablehlo"
        with open(os.path.join(dirpath, fname), "wb") as f:
            f.write(data)
        manifest["artifacts"][name] = {
            "file": fname,
            "batch": None if name == "poly" else int(name[1:]),
            "bytes": len(data),
        }
    mpath = os.path.join(dirpath, BUNDLE_MANIFEST)
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=2)
    return mpath


class BundleServer:
    """Serve ANY request size from an exported bundle.

    Dispatch policy per request of n instances:
    - pick the smallest fixed-batch artifact with B >= n and zero-pad the
      tail (per-instance outputs are batch-independent in eval mode — BN
      uses running stats, attention/confidence are within-sample — so
      padding rows cannot perturb real rows);
    - when n exceeds the largest fixed B, chunk by that B and recurse on the
      remainder;
    - with no fixed artifact at all, fall back to the poly artifact
      (portable XLA paths, recompiled per distinct n at the serving site).

    Artifacts deserialize lazily on first use; each fixed size compiles once.
    """

    def __init__(self, dirpath: str):
        self.dirpath = dirpath
        with open(os.path.join(dirpath, BUNDLE_MANIFEST)) as f:
            manifest = json.load(f)
        self._entries = manifest["artifacts"]
        self.fixed_sizes = sorted(
            e["batch"] for e in self._entries.values() if e["batch"]
        )
        self.has_poly = any(e["batch"] is None for e in self._entries.values())
        self._fns: Dict[str, object] = {}

    def _fn(self, name: str):
        if name not in self._fns:
            path = os.path.join(self.dirpath, self._entries[name]["file"])
            self._fns[name] = load_serve(path)
        return self._fns[name]

    def __call__(self, feats, voxel_idx, obj_idx) -> Dict[str, np.ndarray]:
        n = int(np.asarray(obj_idx).shape[0])
        if n == 0:
            raise ValueError(
                "BundleServer: empty request (0 instances); batch at least "
                "one instance per call"
            )
        if not self.fixed_sizes:
            if not self.has_poly:
                raise RuntimeError("empty bundle")
            return {k: np.asarray(v) for k, v in
                    self._fn("poly")(feats, voxel_idx, obj_idx).items()}
        feats = np.asarray(feats)
        voxel_idx = np.asarray(voxel_idx)
        obj_idx = np.asarray(obj_idx)
        chunks = []
        i = 0
        while i < n:
            rem = n - i
            fit = [b for b in self.fixed_sizes if b >= rem]
            b = fit[0] if fit else self.fixed_sizes[-1]
            take = min(rem, b)

            def pad(x):
                if take == b:
                    return x[i : i + take]
                padded = np.zeros((b,) + x.shape[1:], x.dtype)
                padded[:take] = x[i : i + take]
                return padded

            res = self._fn(f"b{b:05d}")(pad(feats), pad(voxel_idx), pad(obj_idx))
            chunks.append({k: np.asarray(v)[:take] for k, v in res.items()})
            i += take
        if len(chunks) == 1:
            return chunks[0]
        return {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}


def load_serve(path_or_bytes):
    """Deserialize a serving artifact; returns the callable.

    Accepts a filesystem path or the raw bytes. The returned function has
    the exported signature (feats, voxel_idx, obj_idx) -> dict and runs
    under jit on the current backend (which must be one of the artifact's
    platforms).
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    exported = jax.export.deserialize(bytearray(data))
    return jax.jit(exported.call)
