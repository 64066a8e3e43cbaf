"""Serving-export tests: jax.export round-trip + CLI smoke.

The artifact must reproduce the in-process eval forward exactly (same
graph, weights baked as constants) and be callable after deserialization
with no dcl_net_tpu state.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcl_net_tpu.models import DCLNet
from dcl_net_tpu.models.refiner import Refiner
from dcl_net_tpu.ops.voxelize import point_to_voxel_index
from dcl_net_tpu.serving import (
    encode_template_cache,
    export_serve,
    export_serve_stage2,
    load_serve,
    make_serve_fn,
    make_serve_fn_stage2,
)

GRID = (16, 16, 16)
UNIT = (0.024, 0.024, 0.024)
N = 64
C_CLASSES = 3


def _tiny_setup(seed=0):
    rng = np.random.RandomState(seed)
    model = DCLNet(
        unit_voxel_extent=UNIT, voxel_num_limit=GRID, n_inp=N, n_tmp=N,
        capacities=(256, 64, 16, 8),
    )
    tmp = (rng.rand(C_CLASSES, N, 3).astype(np.float32) - 0.5) * 0.15
    rgb = rng.rand(C_CLASSES, N, 3).astype(np.float32) - 0.5
    bank_feats = np.concatenate(
        [np.ones((C_CLASSES, N, 1), np.float32), rgb, tmp], -1)
    bank_vi = np.asarray(point_to_voxel_index(jnp.asarray(tmp), UNIT, GRID))
    bank = {"feats": bank_feats, "voxel_idx": bank_vi}

    b = 4
    obj_idx = rng.randint(0, C_CLASSES, size=(b,)).astype(np.int32)
    pts = (rng.rand(b, N, 3).astype(np.float32) - 0.5) * 0.15
    rgb_i = rng.rand(b, N, 3).astype(np.float32) - 0.5
    feats = np.concatenate([np.ones((b, N, 1), np.float32), rgb_i, pts], -1)
    vi = np.asarray(point_to_voxel_index(jnp.asarray(pts), UNIT, GRID))

    init_batch = {
        "inp": {"feats": jnp.asarray(feats),
                "voxel_idx": jnp.asarray(vi)},
        "tmp": {"feats": jnp.asarray(bank_feats[obj_idx]),
                "voxel_idx": jnp.asarray(bank_vi[obj_idx])},
    }
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(seed), init_batch, train=False)
    return model, variables, bank, feats, vi, obj_idx


def test_export_roundtrip_matches_direct(tmp_path):
    model, variables, bank, feats, vi, obj_idx = _tiny_setup()

    tmp_cache = encode_template_cache(model, variables, bank)
    direct = jax.jit(make_serve_fn(model, variables, tmp_cache))(
        jnp.asarray(feats), jnp.asarray(vi), jnp.asarray(obj_idx))

    data = export_serve(model, variables, bank, batch_size=4,
                        platforms=["cpu"])
    path = tmp_path / "artifact.stablehlo"
    path.write_bytes(data)

    serve = load_serve(str(path))
    got = serve(jnp.asarray(feats), jnp.asarray(vi), jnp.asarray(obj_idx))

    assert set(got) == {"rot_pred", "trans_pred", "conf", "overflow"}
    assert got["rot_pred"].shape == (4, 3, 3)
    assert got["conf"].shape == (4, 2 * N)
    for k in got:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(direct[k]), atol=1e-6,
            err_msg=k)


def test_export_artifact_is_weight_dependent(tmp_path):
    """Different weights must produce a different artifact output — guards
    against accidentally baking init-time constants only."""
    model, variables, bank, feats, vi, obj_idx = _tiny_setup()
    _, variables2, *_ = _tiny_setup(seed=1)
    # re-init with a different key gives different params for same shapes
    a1 = export_serve(model, variables, bank, 4, platforms=["cpu"])
    a2 = export_serve(model, variables2, bank, 4, platforms=["cpu"])
    o1 = load_serve(a1)(jnp.asarray(feats), jnp.asarray(vi),
                        jnp.asarray(obj_idx))
    o2 = load_serve(a2)(jnp.asarray(feats), jnp.asarray(vi),
                        jnp.asarray(obj_idx))
    assert np.abs(np.asarray(o1["trans_pred"])
                  - np.asarray(o2["trans_pred"])).max() > 1e-6


def test_export_stage2_roundtrip_matches_direct(tmp_path):
    """The refined artifact must equal the in-process stage-1+refiner
    chain, and actually move the pose away from the stage-1 output."""
    model, variables, bank, feats, vi, obj_idx = _tiny_setup()
    refiner = Refiner(n_inp=N)
    rng_np = np.random.RandomState(7)
    init_inp = {
        "input_features": jnp.asarray(
            rng_np.randn(1, N, 259).astype(np.float32)),
        "conf": jnp.asarray(rng_np.randn(1, 2 * N).astype(np.float32)),
    }
    refiner_vars = jax.jit(refiner.init)(jax.random.PRNGKey(7), init_inp)

    tmp_cache = encode_template_cache(model, variables, bank)
    direct = jax.jit(make_serve_fn_stage2(
        model, variables, refiner, refiner_vars, tmp_cache, iterations=2))(
        jnp.asarray(feats), jnp.asarray(vi), jnp.asarray(obj_idx))

    data = export_serve_stage2(model, variables, refiner, refiner_vars,
                               bank, batch_size=4, iterations=2,
                               platforms=["cpu"])
    serve = load_serve(data)
    got = serve(jnp.asarray(feats), jnp.asarray(vi), jnp.asarray(obj_idx))

    assert set(got) == {"rot_pred", "trans_pred", "conf", "overflow",
                        "rot_stage1", "trans_stage1"}
    for k in got:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(direct[k]), atol=1e-6,
            err_msg=k)
    # the refiner (random weights) must have composed a non-identity delta
    assert np.abs(np.asarray(got["rot_pred"])
                  - np.asarray(got["rot_stage1"])).max() > 1e-6
    # refined rotations stay valid (ortho9d_to_matrix output composed twice)
    R = np.asarray(got["rot_pred"], np.float64)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3), R.shape),
                               atol=1e-4)


def test_export_polymorphic_batch_matches_fixed(tmp_path):
    """batch_size=None exports ONE batch-polymorphic artifact (symbolic
    batch dim): it must reproduce the fixed-batch artifact's outputs at
    multiple batch sizes, and reject the mesh combination."""
    from dcl_net_tpu.parallel.mesh import make_mesh

    model, variables, bank, feats, vi, obj_idx = _tiny_setup()

    poly = load_serve(export_serve(model, variables, bank, batch_size=None,
                                   platforms=["cpu"]))
    for b in (1, 4):
        fixed = load_serve(export_serve(model, variables, bank,
                                        batch_size=b, platforms=["cpu"]))
        args = (jnp.asarray(feats[:b]), jnp.asarray(vi[:b]),
                jnp.asarray(obj_idx[:b]))
        ref, got = fixed(*args), poly(*args)
        assert got["rot_pred"].shape == (b, 3, 3)
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), atol=1e-6,
                err_msg=f"batch {b}: {k}")

    with pytest.raises(ValueError, match="polymorphic"):
        export_serve(model, variables, bank, batch_size=None,
                     platforms=["cpu"], mesh=make_mesh(4))


def test_export_sharded_mesh_matches_single_device():
    """Data-parallel serving artifact: exported over a 4-device mesh, the
    program must load on the same topology and reproduce the single-device
    artifact's outputs (weights replicated by GSPMD, batch sharded)."""
    from dcl_net_tpu.parallel.mesh import make_mesh, shard_batch

    model, variables, bank, feats, vi, obj_idx = _tiny_setup()
    mesh = make_mesh(4)

    single = export_serve(model, variables, bank, 4, platforms=["cpu"])
    sharded = export_serve(model, variables, bank, 4, platforms=["cpu"],
                           mesh=mesh)

    ref = load_serve(single)(jnp.asarray(feats), jnp.asarray(vi),
                             jnp.asarray(obj_idx))
    args = shard_batch(
        (jnp.asarray(feats), jnp.asarray(vi), jnp.asarray(obj_idx)), mesh)
    got = load_serve(sharded)(*args)
    for k in ref:
        # sharded outputs: assembling the global array crosses devices
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=1e-5, err_msg=k)

    # an off-mesh batch size must be rejected at export time
    with pytest.raises(ValueError, match="not divisible"):
        export_serve(model, variables, bank, 6, platforms=["cpu"],
                     mesh=mesh)


@pytest.mark.parametrize("stage2", [False, True])
def test_export_cli_smoke(tmp_path, stage2):
    from dcl_net_tpu.tools import export as export_tool

    out = tmp_path / "smoke.stablehlo"
    path = export_tool.main([
        "--config", "configs/config_synthetic_smoke.yaml",
        "--out", str(out),
        "--batch", "2",
        # the stage-2 variant also covers the CLI mesh plumbing
        # (data-parallel artifact over 2 of the 8 virtual CPU devices)
        *(["--stage2", "--iteration", "1", "--n_devices", "2"]
          if stage2 else []),
        "--log_root", str(tmp_path / "log"),
        "--override",
        "model.n_inp=64", "model.n_tmp=64",
        "model.voxel_num_limit=[16,16,16]",
        "model.unit_voxel_extent=[0.024,0.024,0.024]",
        "model.capacities=[256,64,16,8]",
        "hyper_dataset_train.input_size=64",
        "hyper_dataset_train.tmp_size=64",
        "hyper_dataset_train.voxel_num_limit=[16,16,16]",
        "hyper_dataset_train.unit_voxel_extent=[0.024,0.024,0.024]",
    ])
    assert os.path.exists(path) and os.path.getsize(path) > 0
    serve = load_serve(path)
    rng = np.random.RandomState(0)
    pts = (rng.rand(2, 64, 3).astype(np.float32) - 0.5) * 0.15
    feats = np.concatenate(
        [np.ones((2, 64, 1), np.float32),
         rng.rand(2, 64, 3).astype(np.float32) - 0.5, pts], -1)
    vi = np.asarray(point_to_voxel_index(
        jnp.asarray(pts), (0.024,) * 3, (16,) * 3))
    args = (jnp.asarray(feats), jnp.asarray(vi), np.zeros((2,), np.int32))
    if stage2:
        # the mesh artifact must be fed mesh-sharded inputs (its program
        # was exported for exactly 2 devices)
        from dcl_net_tpu.parallel.mesh import make_mesh, shard_batch

        args = shard_batch(args, make_mesh(2))
    out = serve(*args)
    assert np.isfinite(np.asarray(out["rot_pred"])).all()
    assert np.isfinite(np.asarray(out["trans_pred"])).all()


def test_bundle_serves_any_request_size(tmp_path):
    """export_bundle/save_bundle/BundleServer: any request size n is served
    by padding into the smallest fitting fixed-batch artifact (or chunking
    past the largest), and per-row outputs equal the direct forward at
    exactly n — eval-mode rows are batch-independent, so padding is exact."""
    from dcl_net_tpu.serving import BundleServer, export_bundle, save_bundle

    model, variables, bank, feats, vi, obj_idx = _tiny_setup()
    arts = export_bundle(model, variables, bank, batch_sizes=(2, 4),
                         include_poly=True, platforms=["cpu"])
    assert set(arts) == {"b00002", "b00004", "poly"}
    bdir = str(tmp_path / "bundle")
    save_bundle(bdir, arts)

    server = BundleServer(bdir)
    assert server.fixed_sizes == [2, 4]
    assert server.has_poly

    tmp_cache = encode_template_cache(model, variables, bank)
    direct_fn = jax.jit(make_serve_fn(model, variables, tmp_cache))
    for n in (1, 2, 3, 4, 5, 7):
        idx = np.resize(np.arange(len(obj_idx)), n)
        f, v, o = feats[idx], vi[idx], obj_idx[idx]
        got = server(f, v, o)
        ref = direct_fn(jnp.asarray(f), jnp.asarray(v), jnp.asarray(o))
        assert got["rot_pred"].shape == (n, 3, 3)
        assert got["overflow"].shape == (n,)
        for k in ("rot_pred", "trans_pred", "conf"):
            np.testing.assert_allclose(
                got[k], np.asarray(ref[k]), atol=1e-5, err_msg=f"n={n} {k}")

    # an empty request is a caller error and must fail loudly, not IndexError
    with pytest.raises(ValueError, match="empty request"):
        server(feats[:0], vi[:0], obj_idx[:0])


def test_bundle_poly_fallback_without_fixed_sizes(tmp_path):
    from dcl_net_tpu.serving import BundleServer, export_bundle, save_bundle

    model, variables, bank, feats, vi, obj_idx = _tiny_setup()
    arts = export_bundle(model, variables, bank, batch_sizes=(),
                         include_poly=True, platforms=["cpu"])
    bdir = str(tmp_path / "poly_only")
    save_bundle(bdir, arts)
    server = BundleServer(bdir)
    assert server.fixed_sizes == [] and server.has_poly
    got = server(feats[:3], vi[:3], obj_idx[:3])
    assert got["rot_pred"].shape == (3, 3, 3)
    assert np.isfinite(got["trans_pred"]).all()


def test_bundle_cli_smoke(tmp_path):
    from dcl_net_tpu.serving import BundleServer
    from dcl_net_tpu.tools import export as export_tool

    bdir = export_tool.main([
        "--config", "configs/config_synthetic_smoke.yaml",
        "--bundle", str(tmp_path / "bundle"),
        "--bundle_batches", "2,4",
        "--log_root", str(tmp_path / "log"),
        "--override",
        "model.n_inp=64", "model.n_tmp=64",
        "model.voxel_num_limit=[16,16,16]",
        "model.unit_voxel_extent=[0.024,0.024,0.024]",
        "model.capacities=[256,64,16,8]",
        "hyper_dataset_train.input_size=64",
        "hyper_dataset_train.tmp_size=64",
        "hyper_dataset_train.voxel_num_limit=[16,16,16]",
        "hyper_dataset_train.unit_voxel_extent=[0.024,0.024,0.024]",
    ])
    server = BundleServer(bdir)
    assert server.fixed_sizes == [2, 4] and server.has_poly
    rng = np.random.RandomState(0)
    pts = (rng.rand(3, 64, 3).astype(np.float32) - 0.5) * 0.15
    feats = np.concatenate(
        [np.ones((3, 64, 1), np.float32),
         rng.rand(3, 64, 3).astype(np.float32) - 0.5, pts], -1)
    vi = np.asarray(point_to_voxel_index(
        jnp.asarray(pts), (0.024,) * 3, (16,) * 3))
    got = server(feats, vi, np.zeros((3,), np.int32))
    assert got["rot_pred"].shape == (3, 3, 3)
    assert np.isfinite(got["trans_pred"]).all()
