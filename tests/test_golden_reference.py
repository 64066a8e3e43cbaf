"""Golden parity against the REFERENCE'S OWN torch modules.

Unlike test_converter.py (layer-family twins), the torch side here is the
reference's actual code, imported from /root/reference with its CUDA-only
dependencies stubbed in sys.modules:

  - models/Modules.py:58-201  -> BasicBlock_3DCONV, Aligner,
    Head_MultiLayerPerceptron (needs fake `spconv` + `libs.pointnet_sp`)
  - models/DCL_Net.py:15-36   -> ortho9d2matrix (module-level, importable
    without instantiating Network)
  - models/DCL_Net.py:261-311 -> the `losses` class
  - models/refiner.py:5-133   -> Refiner + losses_refiner

The composed post-backbone chain is assembled from those imported classes
with the exact constructor arguments of Network.__init__ (models/
DCL_Net.py:56-153) and the exact wiring of Network.forward (:188-235), so a
transcription error in a hand-written twin cannot hide: every learned layer,
activation order, BN placement, attention direction, confidence pooling and
the SVD orthogonalization run the reference's own code. `.cuda()` calls
inside the reference are neutralized by a no-op Tensor.cuda patch (CPU-only
torch in this environment).

Weights flow reference -> ours through convert_reference_state_dict on the
reference modules' state_dict (the real checkpoint key naming), then both
sides consume identical inputs.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dcl_net_tpu.data.schema import make_batch  # noqa: E402
from dcl_net_tpu.data.synthetic import SyntheticPoseDataset  # noqa: E402
from dcl_net_tpu.models import DCLNet, Refiner, dcl_losses  # noqa: E402
from dcl_net_tpu.models.refiner import refiner_losses  # noqa: E402
from dcl_net_tpu.train.checkpoints import convert_reference_state_dict  # noqa: E402

REF_ROOT = "/root/reference"

GRID = (16, 16, 16)
UNIT = (0.024, 0.024, 0.024)
N = 128


def _knn_cpu(k, unknown, known):
    """CPU stand-in for libs/pointnet_lib's CUDA knn (pointnet2_utils.py:
    78-105): brute-force smallest-k, returns (sqrt distances, int32 idx)."""
    d2 = ((unknown[:, :, None, :] - known[:, None, :, :]) ** 2).sum(-1)
    vals, idx = torch.topk(d2, k, dim=2, largest=False)
    return torch.sqrt(vals), idx.int()


def _install_reference_stubs():
    """Inject fake CUDA-extension modules so the reference's model files
    import on CPU (the classes under test never call into them)."""

    def module(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        m.__path__ = []  # behave like a package for submodule imports
        sys.modules[name] = m
        return m

    class _Placeholder:
        def __init__(self, *a, **kw):
            raise RuntimeError("stub spconv layer must not be instantiated")

    if "spconv" not in sys.modules or not hasattr(
        sys.modules["spconv"], "_dcl_tpu_stub"
    ):
        module(
            "spconv",
            _dcl_tpu_stub=True,
            SparseConv3d=_Placeholder,
            SubMConv3d=_Placeholder,
            SparseSequential=_Placeholder,
            SparseAvgPool3d=_Placeholder,
            SparseMaxPool3d=_Placeholder,
            SparseConvTensor=_Placeholder,
        )
    module("ipdb", set_trace=lambda: None)

    class _NoWriter:
        def __init__(self, *a, **kw):
            pass

    module("tensorboardX", SummaryWriter=_NoWriter)

    module("libs")
    module("libs.pointnet_lib")
    module("libs.pointnet_lib.pointnet2_utils", knn=_knn_cpu)
    module("libs.pointnet_sp")
    module("libs.pointnet_sp.pointnet2_utils", three_nn=None, three_interpolate=None)
    module("libs.pointgroup_ops")
    module("libs.pointgroup_ops.functions", pointgroup_ops=types.SimpleNamespace())

    # the reference calls .cuda() on tensors inside forward/ortho9d2matrix;
    # CPU-only torch: make it the identity
    torch.Tensor.cuda = lambda self, *a, **kw: self


@pytest.fixture(scope="module")
def refmods():
    """Import the reference's model modules with stubs installed."""
    import os

    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference checkout not available")
    _install_reference_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import models.DCL_Net as ref_dcl  # noqa: PLC0415
    import models.Modules as ref_mod  # noqa: PLC0415
    import models.refiner as ref_refiner  # noqa: PLC0415

    return ref_mod, ref_dcl, ref_refiner


def _build_ref_post_backbone(ref_mod, ref_dcl):
    """The reference Network's post-backbone stages, built from the
    REFERENCE'S OWN classes with Network.__init__'s exact arguments
    (models/DCL_Net.py:56-153) and Network.forward's exact wiring
    (:188-235)."""
    from functools import partial

    common = {"size": 1, "bias": False, "stride": 1, "padding": 0,
              "norm": True, "act": "relu", "drop": 0.0}
    blk = partial(ref_mod.BasicBlock_3DCONV, **common)
    head = ref_mod.Head_MultiLayerPerceptron

    class RefPostBackbone(tnn.Module):
        def __init__(self):
            super().__init__()
            mk_p = lambda: tnn.Sequential(blk(dim_in=480, dim_out=256),
                                          blk(dim_in=256, dim_out=256))
            mk_m = lambda: tnn.Sequential(blk(dim_in=480, dim_out=256),
                                          blk(dim_in=256, dim_out=64))
            self.disengage_Xc_p1 = mk_p()
            self.disengage_Xc_m1 = mk_m()
            self.disengage_Yo_p1 = mk_p()
            self.disengage_Yo_m1 = mk_m()
            self.disengage_Xc_p2 = mk_p()
            self.disengage_Xc_m2 = mk_m()
            self.disengage_Yo_p2 = mk_p()
            self.disengage_Yo_m2 = mk_m()
            self.neck_cross_att = ref_mod.Aligner()
            reg = lambda din, dims: head(
                [din] + dims, ["relu", "relu", "none"], [False] * 3, [0.0] * 3)
            self.regressor_Xo = reg(256, [256, 128, 3])
            self.regressor_Yc = reg(256, [256, 128, 3])
            self.regressor_conf = reg(64 * 2, [128, 128, 1])
            self.regressor_conf_bi = reg(64 * 2, [128, 128, 1])
            fuser = lambda: head([256 * 2, 512, 512, 1024], ["relu"] * 3,
                                 [True] * 3, [0.0] * 3)
            self.neck_fuser = fuser()
            self.neck_fuser_bi = fuser()
            self.regressor_rot = reg(1024, [512, 128, 9])
            self.regressor_trans = reg(1024, [512, 128, 3])

        def forward(self, f_xc, f_yo):
            # f_xc: [B, 480, N], f_yo: [B, 480, M]; wiring is
            # models/DCL_Net.py:188-235 verbatim
            as5d = lambda f: f[:, :, :, None, None]
            sq = lambda f: f.squeeze(-1).squeeze(-1)
            F_Xc, F_Yo = as5d(f_xc), as5d(f_yo)
            F_Xc_p1 = sq(self.disengage_Xc_p1(F_Xc))
            F_Xc_m1 = sq(self.disengage_Xc_m1(F_Xc))
            F_Xc_p2 = sq(self.disengage_Xc_p2(F_Xc))
            F_Xc_m2 = sq(self.disengage_Xc_m2(F_Xc))
            F_Yo_p1 = sq(self.disengage_Yo_p1(F_Yo))
            F_Yo_m1 = sq(self.disengage_Yo_m1(F_Yo))
            F_Yo_p2 = sq(self.disengage_Yo_p2(F_Yo))
            F_Yo_m2 = sq(self.disengage_Yo_m2(F_Yo))

            F_Xo_p, attention_map = self.neck_cross_att(F_Xc_m1, F_Yo_m1, F_Yo_p1)
            Xo_pred = self.regressor_Xo(F_Xo_p)
            F_Yc_p, attention_map_bi = self.neck_cross_att(F_Yo_m2, F_Xc_m2, F_Xc_p2)
            Yc_pred = self.regressor_Yc(F_Yc_p)

            F_Xo_m = torch.bmm(F_Yo_m1, attention_map)
            F_m1 = torch.cat([F_Xc_m1, F_Xo_m], dim=1)
            F_Yc_m = torch.bmm(F_Xc_m2, attention_map_bi)
            F_m2 = torch.cat([F_Yc_m, F_Yo_m2], dim=1)
            conf = torch.sigmoid(torch.cat(
                [self.regressor_conf(F_m1), self.regressor_conf_bi(F_m2)], dim=2))
            conf_softmax = torch.softmax(conf, dim=2)

            F_p1 = self.neck_fuser(torch.cat([F_Xc_p1, F_Xo_p], dim=1))
            F_p2 = self.neck_fuser_bi(torch.cat([F_Yc_p, F_Yo_p2], dim=1))
            F_p = torch.cat([F_p1, F_p2], dim=2)
            F_p_wei = torch.sum(F_p * conf_softmax, dim=2, keepdim=True)

            ortho9d = self.regressor_rot(F_p_wei).squeeze(-1)
            rot = ref_dcl.ortho9d2matrix(
                ortho9d[:, :3], ortho9d[:, 3:6], ortho9d[:, 6:])
            trans = self.regressor_trans(F_p_wei).squeeze(-1)
            return {
                "rot_pred": rot, "trans_pred": trans, "conf": conf.squeeze(1),
                "Xo_pred": Xo_pred.transpose(1, 2),
                "Yc_pred": Yc_pred.transpose(1, 2),
                "F_Xo_p": F_Xo_p,
            }

    return RefPostBackbone()


def _randomize_bn(module, rng):
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm3d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.tensor(rng.randn(m.num_features) * 0.1))
                m.running_var.copy_(torch.tensor(rng.rand(m.num_features) + 0.5))
                m.weight.copy_(torch.tensor(rng.randn(m.num_features) * 0.2 + 1))
                m.bias.copy_(torch.tensor(rng.randn(m.num_features) * 0.1))


@pytest.fixture(scope="module")
def setup(refmods):
    ref_mod, ref_dcl, _ = refmods
    rng = np.random.RandomState(11)
    torch.manual_seed(11)
    tmodel = _build_ref_post_backbone(ref_mod, ref_dcl)
    _randomize_bn(tmodel, rng)
    tmodel.eval()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if "num_batches" not in k}
    converted = convert_reference_state_dict(sd)

    ds = SyntheticPoseDataset(
        n_objects=2, n_points=N, unit_voxel_extent=UNIT, voxel_num_limit=GRID,
        seed=7,
    )
    batch = jax.tree.map(jnp.asarray, make_batch([ds[i] for i in range(2)]).to_dict())

    model = DCLNet(
        unit_voxel_extent=UNIT, voxel_num_limit=GRID, n_inp=N, n_tmp=N,
        capacities=(256, 64, 16, 8),
    )
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    params.update(converted["params"])
    stats.update(converted["batch_stats"])
    merged = {"params": params, "batch_stats": stats}
    return tmodel, model, merged, batch


def test_composed_forward_matches_reference_code(setup):
    """Our full post-backbone forward vs the reference's own classes on
    identical 480-d features and identical (converted) weights."""
    tmodel, model, variables, batch = setup

    ours = model.apply(variables, batch, train=False)

    def get_feats(mdl, b):
        _, fx, _ = mdl._encode(mdl.backbone_inp, mdl.point_feats_inp,
                               b["inp"]["feats"], b["inp"]["voxel_idx"], False)
        _, fy, _ = mdl._encode(mdl.backbone_tmp, mdl.point_feats_tmp,
                               b["tmp"]["feats"], b["tmp"]["voxel_idx"], False)
        return fx, fy

    fx, fy = model.apply(variables, batch, method=get_feats)
    with torch.no_grad():
        ref = tmodel(
            torch.tensor(np.asarray(fx)).permute(0, 2, 1).contiguous(),
            torch.tensor(np.asarray(fy)).permute(0, 2, 1).contiguous(),
        )

    np.testing.assert_allclose(
        np.asarray(ours["Xo_pred"]), ref["Xo_pred"].numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(ours["Yc_pred"]), ref["Yc_pred"].numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(ours["conf"]), ref["conf"].numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(ours["trans_pred"]), ref["trans_pred"].numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(ours["rot_pred"]), ref["rot_pred"].numpy(), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(ours["F_Xo_p"]),
        ref["F_Xo_p"].permute(0, 2, 1).numpy(), atol=2e-4)


def test_loss_stack_matches_reference_code(setup, refmods):
    """Our loss stack vs the reference's own `losses` class
    (models/DCL_Net.py:261-311) on identical predictions."""
    _, ref_dcl, _ = refmods
    _, model, variables, batch = setup
    ours_pred = model.apply(variables, batch, train=False)
    ours_losses = dcl_losses(ours_pred, batch)

    t = lambda x: torch.tensor(np.asarray(x))
    ref_loss_mod = ref_dcl.losses(cfg=None)
    loss_inp_pred = {
        "rot_pred": t(ours_pred["rot_pred"]),
        "trans_pred": t(ours_pred["trans_pred"]),
        "sym_flag": t(batch["sym_flag"]),
        "conf": t(ours_pred["conf"]),
        "Xo_pred": t(ours_pred["Xo_pred"]),
        "Yc_pred": t(ours_pred["Yc_pred"]),
    }
    loss_inp_gt = {
        "rot_gt": t(batch["labels"]["rot_gt"]),
        "trans_gt": t(batch["labels"]["trans_gt"]),
        "points_tmp": t(ours_pred["points_tmp"]),
        "points_inp": t(ours_pred["points_inp"]),
    }
    with torch.no_grad():
        ref_losses = ref_loss_mod(loss_inp_pred, loss_inp_gt)

    for k in ("loss_pose", "loss_Xo", "loss_Yc", "loss_conf", "loss_all"):
        np.testing.assert_allclose(
            float(ours_losses[k]), float(ref_losses[k]), rtol=1e-5, atol=1e-6,
            err_msg=k,
        )


@pytest.mark.slow
def test_loss_gradients_match_reference_code(setup, refmods):
    """GRADIENT golden parity: d(loss_all)/d(post-backbone params) via torch
    autograd through the reference's own composed modules + `losses` class
    vs jax.grad through our model + loss stack, on identical converted
    weights and identical encoder features (held constant on both sides).
    With the optimizer separately golden-matched (tests/test_golden_train),
    matching gradients pin the training DYNAMICS, not just the forward.

    Torch grads are transported to flax layout by running the same
    state-dict converter on the grad tensors — valid because the converter
    is pure transpose/reshape, which commutes with differentiation."""
    tmodel, model, variables, batch = setup
    _, ref_dcl, _ = refmods

    # ---- our side: grad w.r.t. ALL params (encoder grads unused below)
    stats = variables["batch_stats"]

    def loss_fn(p):
        pred = model.apply({"params": p, "batch_stats": stats}, batch,
                           train=False)
        return dcl_losses(pred, batch)["loss_all"]

    g_ours = jax.grad(loss_fn)(variables["params"])

    # ---- reference side: same features in, torch autograd out
    def _get_feats(mdl, b):
        return (
            mdl._encode(mdl.backbone_inp, mdl.point_feats_inp,
                        b["inp"]["feats"], b["inp"]["voxel_idx"], False)[1],
            mdl._encode(mdl.backbone_tmp, mdl.point_feats_tmp,
                        b["tmp"]["feats"], b["tmp"]["voxel_idx"], False)[1],
        )

    fx, fy = model.apply(variables, batch, method=_get_feats)
    ours_pred = model.apply(variables, batch, train=False)
    tmodel.zero_grad()
    ref = tmodel(
        torch.tensor(np.asarray(fx)).permute(0, 2, 1).contiguous(),
        torch.tensor(np.asarray(fy)).permute(0, 2, 1).contiguous(),
    )
    t = lambda x: torch.tensor(np.asarray(x))
    ref_losses = ref_dcl.losses(cfg=None)(
        {
            "rot_pred": ref["rot_pred"], "trans_pred": ref["trans_pred"],
            "sym_flag": t(batch["sym_flag"]), "conf": ref["conf"],
            "Xo_pred": ref["Xo_pred"], "Yc_pred": ref["Yc_pred"],
        },
        {
            "rot_gt": t(batch["labels"]["rot_gt"]),
            "trans_gt": t(batch["labels"]["trans_gt"]),
            "points_tmp": t(ours_pred["points_tmp"]),
            "points_inp": t(ours_pred["points_inp"]),
        },
    )
    ref_losses["loss_all"].backward()

    sd = tmodel.state_dict()
    grad_sd = {}
    for k, v in sd.items():
        if "num_batches" in k:
            continue
        grad_sd[k] = v.numpy()  # BN running stats: placeholder, ignored
    for name, p in tmodel.named_parameters():
        grad_sd[name] = (
            p.grad.detach().numpy() if p.grad is not None
            else np.zeros_like(p.detach().numpy())
        )
    g_ref = convert_reference_state_dict(grad_sd)["params"]

    # compare every converted (post-backbone) grad leaf
    flat_ours = jax.tree_util.tree_flatten_with_path(g_ours)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(g_ref)[0])
    compared = 0
    for path, leaf in flat_ours:
        if path not in flat_ref:
            continue  # encoder/backbone param: frozen constant on torch side
        ours_np, ref_np = np.asarray(leaf), np.asarray(flat_ref[path])
        scale = max(float(np.abs(ref_np).max()), 1e-8)
        np.testing.assert_allclose(
            ours_np, ref_np, rtol=0, atol=1e-3 * scale,
            err_msg=jax.tree_util.keystr(path),
        )
        compared += 1
    assert compared >= 50, compared  # every post-backbone kernel/scale/bias


def test_refiner_matches_reference_code(refmods):
    """Our Refiner vs the reference's own Refiner (models/refiner.py:57-95)
    on identical inputs and converted weights. n=1024 because the reference
    hardcodes the conf-softmax truncation at 1024 (:81)."""
    _, _, ref_refiner = refmods
    rng = np.random.RandomState(3)
    torch.manual_seed(3)
    n, b = 1024, 2

    tref = ref_refiner.Refiner(cfg=None)
    tref.eval()
    sd = {k: v.numpy() for k, v in tref.state_dict().items()}
    converted = convert_reference_state_dict(sd)

    feats = rng.randn(b, n, 259).astype(np.float32)
    conf = rng.rand(b, 2 * n).astype(np.float32) * 0.9 + 0.05

    ours = Refiner(n_inp=n)
    out = ours.apply(
        {"params": converted["params"]},
        {"input_features": jnp.asarray(feats), "conf": jnp.asarray(conf)},
    )
    with torch.no_grad():
        ref_out = tref({
            "input_features": torch.tensor(feats).permute(0, 2, 1).contiguous(),
            "conf": torch.tensor(conf),
        })

    np.testing.assert_allclose(
        np.asarray(out["trans_pred"]), ref_out["trans_pred"].numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["rot_pred"]), ref_out["rot_pred"].numpy(), atol=5e-4)


def test_refiner_losses_match_reference_code(refmods):
    """Our refiner_losses vs the reference's own losses_refiner
    (models/refiner.py:99-125) on identical inputs."""
    _, _, ref_refiner = refmods
    rng = np.random.RandomState(5)
    b, p = 4, 64

    def rot(r):
        q, _ = np.linalg.qr(r.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        return q.astype(np.float32)

    pts = rng.randn(b, p, 3).astype(np.float32) * 0.05
    rot_cur = np.stack([rot(rng) for _ in range(b)])
    rot_gt = np.stack([rot(rng) for _ in range(b)])
    drot = np.stack([rot(rng) for _ in range(b)])
    trans_cur = rng.randn(b, 3).astype(np.float32) * 0.02
    trans_gt = rng.randn(b, 3).astype(np.float32) * 0.02
    dtrans = rng.randn(b, 3).astype(np.float32) * 0.01
    sym = np.array([0, 1, 0, 1], np.float32)

    pred = {"rot_pred": jnp.asarray(drot), "trans_pred": jnp.asarray(dtrans)}
    ours = refiner_losses(
        pred, jnp.asarray(trans_cur), jnp.asarray(rot_cur), jnp.asarray(pts),
        jnp.asarray(sym), jnp.asarray(rot_gt), jnp.asarray(trans_gt),
    )

    t = torch.tensor
    ref_mod = ref_refiner.losses_refiner(cfg=None)
    with torch.no_grad():
        ref = ref_mod(
            {"rot_pred": t(drot), "trans_pred": t(dtrans)},
            t(trans_cur), t(rot_cur), t(pts), t(sym),
            {"rot_gt": t(rot_gt), "trans_gt": t(trans_gt)},
        )
    np.testing.assert_allclose(
        float(ours["loss_pose"]), float(ref["loss_pose"]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        float(ours["loss_all"]), float(ref["loss_all"]), rtol=1e-5, atol=1e-7)


def test_refiner_gradients_match_reference_code(refmods):
    """Stage-2 GRADIENT parity: d(loss_all)/d(refiner params) through the
    reference's own Refiner + losses_refiner (torch autograd, incl. the
    SVD in ortho9d2matrix) vs jax.grad through ours, on converted weights.
    Same grad-transport trick as the stage-1 test: the converter is pure
    transpose/reshape."""
    _, _, ref_refiner = refmods
    rng = np.random.RandomState(13)
    torch.manual_seed(13)
    n, b, p = 1024, 2, 64

    tref = ref_refiner.Refiner(cfg=None)
    tref.eval()
    sd = {k: v.numpy() for k, v in tref.state_dict().items()}
    converted = convert_reference_state_dict(sd)

    feats = rng.randn(b, n, 259).astype(np.float32)
    conf = rng.rand(b, 2 * n).astype(np.float32) * 0.9 + 0.05
    pts = rng.randn(b, p, 3).astype(np.float32) * 0.05

    def rot(r):
        q, _ = np.linalg.qr(r.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        return q.astype(np.float32)

    rot_cur = np.stack([rot(rng) for _ in range(b)])
    rot_gt = np.stack([rot(rng) for _ in range(b)])
    trans_cur = rng.randn(b, 3).astype(np.float32) * 0.02
    trans_gt = rng.randn(b, 3).astype(np.float32) * 0.02
    sym = np.array([0.0, 1.0], np.float32)

    ours = Refiner(n_inp=n)

    def loss_fn(params):
        out = ours.apply(
            {"params": params},
            {"input_features": jnp.asarray(feats), "conf": jnp.asarray(conf)},
        )
        return refiner_losses(
            out, jnp.asarray(trans_cur), jnp.asarray(rot_cur),
            jnp.asarray(pts), jnp.asarray(sym), jnp.asarray(rot_gt),
            jnp.asarray(trans_gt),
        )["loss_all"]

    g_ours = jax.grad(loss_fn)(converted["params"])

    t = torch.tensor
    tref.zero_grad()
    ref_out = tref({
        "input_features": t(feats).permute(0, 2, 1).contiguous(),
        "conf": t(conf),
    })
    ref_loss = ref_refiner.losses_refiner(cfg=None)(
        ref_out, t(trans_cur), t(rot_cur), t(pts), t(sym),
        {"rot_gt": t(rot_gt), "trans_gt": t(trans_gt)},
    )
    ref_loss["loss_all"].backward()

    grad_sd = {k: v.numpy() for k, v in tref.state_dict().items()
               if "num_batches" not in k}
    for name, prm in tref.named_parameters():
        grad_sd[name] = (
            prm.grad.detach().numpy() if prm.grad is not None
            else np.zeros_like(prm.detach().numpy())
        )
    g_ref = convert_reference_state_dict(grad_sd)["params"]

    flat_ours = jax.tree_util.tree_flatten_with_path(g_ours)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(g_ref)[0])
    compared = 0
    for path, leaf in flat_ours:
        assert path in flat_ref, jax.tree_util.keystr(path)
        ours_np, ref_np = np.asarray(leaf), np.asarray(flat_ref[path])
        scale = max(float(np.abs(ref_np).max()), 1e-8)
        np.testing.assert_allclose(
            ours_np, ref_np, rtol=0, atol=1e-3 * scale,
            err_msg=jax.tree_util.keystr(path),
        )
        compared += 1
    assert compared >= 10, compared


def test_ortho9d_matches_reference_code(refmods):
    """ortho9d2matrix: our SVD orthogonalization vs the reference's
    (models/DCL_Net.py:15-36) on the same raw 9D inputs."""
    from dcl_net_tpu.geometry.rotation import ortho9d_to_matrix

    _, ref_dcl, _ = refmods
    rng = np.random.RandomState(9)
    raw = rng.randn(8, 9).astype(np.float32)

    ours = ortho9d_to_matrix(
        jnp.asarray(raw[:, :3]), jnp.asarray(raw[:, 3:6]), jnp.asarray(raw[:, 6:])
    )
    with torch.no_grad():
        ref = ref_dcl.ortho9d2matrix(
            torch.tensor(raw[:, :3]), torch.tensor(raw[:, 3:6]),
            torch.tensor(raw[:, 6:]),
        )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)
    # proper rotations both sides
    dets = np.linalg.det(np.asarray(ours))
    np.testing.assert_allclose(dets, 1.0, atol=1e-5)


def test_rotation_utils_match_reference_code(refmods):
    """Rotation utility family (SURVEY P13/P14) vs the reference's own
    utils/rotation.py + utils/transform3D.py, imported from the checkout."""
    del refmods  # ensures stubs are installed + sys.path set
    import utils.rotation as ref_rot
    import utils.transform3D as ref_t3d

    from dcl_net_tpu.geometry.rotation import (
        axis_angle_to_matrix,
        ortho6d_to_matrix,
        quaternion_multiply,
        quaternion_to_matrix,
        translate_rotate,
    )

    rng = np.random.RandomState(21)
    t = lambda x: torch.tensor(x)

    # ortho6d: BOTH reference variants (rotation.py:28-39, transform3D.py:
    # 51-72) use the y-first Gram-Schmidt — ours must match them exactly
    x6 = rng.randn(16, 3).astype(np.float32)
    y6 = rng.randn(16, 3).astype(np.float32)
    ours6 = np.asarray(ortho6d_to_matrix(jnp.asarray(x6), jnp.asarray(y6)))
    with torch.no_grad():
        ref6a = ref_rot.compute_rotation_matrix_from_ortho6d(t(x6), t(y6)).numpy()
        ref6b = ref_t3d.ortho6d2matrix(t(x6), t(y6)).numpy()
    np.testing.assert_allclose(ours6, ref6a, atol=1e-5)
    np.testing.assert_allclose(ours6, ref6b, atol=1e-5)

    # quaternion -> matrix (reference goes through its axis-angle + y-polar
    # angle machinery, transform3D.py:74-119 — same rotation, different path)
    q = rng.randn(16, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q[:, 0] = np.abs(q[:, 0])  # w >= 0 (reference acos branch)
    ours_q = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    with torch.no_grad():
        ref_q = ref_t3d.quaternion_to_matrix(t(q)).numpy()
    np.testing.assert_allclose(ours_q, ref_q, atol=1e-4)

    # axis-angle -> matrix
    axis = rng.randn(16, 3).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    ang = rng.uniform(-np.pi, np.pi, 16).astype(np.float32)
    ours_aa = np.asarray(axis_angle_to_matrix(jnp.asarray(axis), jnp.asarray(ang)))
    with torch.no_grad():
        ref_aa = ref_t3d.axis_angle_to_matrix(t(axis), t(ang)).numpy()
    np.testing.assert_allclose(ours_aa, ref_aa, atol=1e-4)

    # quaternion composition: R(q1 o q2) == R(q1) @ R(q2), and ours matches
    # the reference's compose_quaternion component-for-component
    q2 = rng.randn(16, 4).astype(np.float32)
    q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
    q2[:, 0] = np.abs(q2[:, 0])
    ours_c = np.asarray(quaternion_multiply(jnp.asarray(q), jnp.asarray(q2)))
    with torch.no_grad():
        ref_c = ref_rot.compose_quaternion(t(q), t(q2)).numpy()
    np.testing.assert_allclose(ours_c, ref_c, atol=1e-6)

    # translate_rotate: rot @ (cloud + trans) in the reference's layout
    cloud = rng.randn(64, 3).astype(np.float32)
    trans = rng.randn(1, 3).astype(np.float32)
    rotm = ref6a[0]
    ours_tr = np.asarray(translate_rotate(
        jnp.asarray(cloud), jnp.asarray(trans[0]), jnp.asarray(rotm)))
    with torch.no_grad():
        ref_tr = ref_t3d.translate_rotate(t(cloud), t(rotm), t(trans)).numpy()
    np.testing.assert_allclose(ours_tr, ref_tr, atol=1e-5)


def test_multiscale_interp_matches_reference_code(refmods):
    """MultiScalePointFeatures vs the reference's own Ops_GetPointFeat_spconv
    + Ops_tensor2points (models/Modules.py:204-251) — the voxel-center
    arithmetic (idx*unit*scale + offset + 0.5*unit*scale), the
    scale_lists=[2,4,6,8] quirk and the 1/(dist2+1e-8) weighting all run the
    reference's code; only the CUDA three_nn/three_interpolate are CPU
    stand-ins with the kernel's exact semantics (batch-id filter, SQUARED
    distances; libs/pointnet_sp/src/interpolate_gpu.cu:9-56)."""
    ref_mod, _, _ = refmods

    import types as _types

    from dcl_net_tpu.models.backbone import MultiScalePointFeatures

    # CPU stand-ins for the pointnet_sp CUDA ops, installed into the stub
    # module the reference imported at module load
    def three_nn_cpu(target, query):
        # double accumulation like the kernel's `double best` + 1e40 sentinel
        t, q = target.double(), query.double()
        d2 = ((t[:, None, 1:] - q[None, :, 1:]) ** 2).sum(-1)
        d2 = torch.where(t[:, 0][:, None] == q[None, :, 0], d2, d2 + 1e40)
        if d2.shape[1] < 3:  # kernel defaults: best=1e40, besti=0
            pad = torch.full((d2.shape[0], 3 - d2.shape[1]), 1e40, dtype=torch.float64)
            d2 = torch.cat([d2, pad], 1)
        vals, idx = torch.topk(d2, 3, dim=1, largest=False)
        idx = torch.where(vals >= 1e40, torch.zeros_like(idx), idx)
        return vals.float(), idx.int()

    def three_interpolate_cpu(feats, idx, weight):
        return (feats[idx.long()] * weight[..., None]).sum(1)

    sys.modules["libs.pointnet_sp.pointnet2_utils"].three_nn = three_nn_cpu
    sys.modules["libs.pointnet_sp.pointnet2_utils"].three_interpolate = (
        three_interpolate_cpu
    )
    # Modules.py bound the stub module object at import time — same object,
    # attribute updates are visible

    rng = np.random.RandomState(31)
    B = 2
    limit = np.array([16, 16, 16], np.float64)
    unit = np.array([0.024, 0.025, 0.026], np.float64)  # anisotropic on purpose
    dims = [(8, 8, 8), (4, 4, 4), (2, 2, 2), (1, 1, 1)]
    chans = [32, 64, 128, 256]
    n_pts = 64

    pyramid, ref_tensors = [], []
    for (d, h, w), c in zip(dims, chans):
        mask = (rng.rand(B, d, h, w) < 0.4)
        for b in range(B):  # >=3 occupied per batch where possible
            while mask[b].sum() < min(3, d * h * w):
                mask[b, rng.randint(d), rng.randint(h), rng.randint(w)] = True
        feats = rng.randn(B, d, h, w, c).astype(np.float32) * mask[..., None]
        pyramid.append((jnp.asarray(feats), jnp.asarray(mask.astype(np.float32))))
        bb, ii, jj, kk = np.nonzero(mask)
        indices = np.stack([bb, ii, jj, kk], 1).astype(np.float32)
        ref_tensors.append(_types.SimpleNamespace(
            features=torch.tensor(feats[bb, ii, jj, kk]),
            indices=torch.tensor(indices),
        ))

    pts = (rng.rand(B, n_pts, 3) - 0.5) * (unit * limit) * 0.9
    pts = pts.astype(np.float32)

    msf = MultiScalePointFeatures(
        unit_voxel_extent=tuple(unit), voxel_num_limit=tuple(int(v) for v in limit),
        scale_list=(2, 4, 6, 8), capacities=(512, 64, 8, 1),
        interp_mode="exact",
    )
    ours, _ = msf.apply({}, jnp.asarray(pts), pyramid)

    op = ref_mod.Ops_GetPointFeat_spconv(
        scale_lists=[2, 4, 6, 8], unit_voxel_extent=unit, voxel_num_limit=limit,
    )
    flat_pts = torch.tensor(pts.reshape(-1, 3))
    batch_ids = torch.arange(B).repeat_interleave(n_pts).reshape(-1, 1).float()
    with torch.no_grad():
        ref = op(flat_pts, batch_ids, *ref_tensors).numpy().reshape(B, n_pts, -1)

    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_get_cano_label_matches_reference_code(refmods):
    """losses.get_cano_label (reference models/DCL_Net.py:312-317) vs ours:
    canonicalize the observed cloud by the predicted rotation, 1-NN match
    into the template, gather the matched template points. The reference
    side runs its own staticmethod with the CUDA knn replaced by the
    exact-semantics CPU stand-in (_knn_cpu)."""
    _, ref_dcl, _ = refmods
    from dcl_net_tpu.models.dcl_net import get_cano_label

    rng = np.random.RandomState(17)
    b, n, m = 3, 96, 80
    tmp = rng.randn(b, m, 3).astype(np.float32) * 0.05
    inp = rng.randn(b, n, 3).astype(np.float32) * 0.05
    trans = rng.randn(b, 3).astype(np.float32) * 0.02

    def rot(r):
        q, _ = np.linalg.qr(r.randn(3, 3))
        return (q * np.sign(np.linalg.det(q))).astype(np.float32)

    rots = np.stack([rot(rng) for _ in range(b)])

    ours = np.asarray(get_cano_label(
        jnp.asarray(tmp), jnp.asarray(inp), jnp.asarray(rots),
        jnp.asarray(trans),
    ))
    t = torch.tensor
    with torch.no_grad():
        ref = ref_dcl.losses.get_cano_label(
            t(tmp), t(inp), t(rots), t(trans[:, None, :])
        ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
