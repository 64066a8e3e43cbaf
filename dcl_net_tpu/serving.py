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

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp


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
