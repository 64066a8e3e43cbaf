"""Composed-forward golden parity vs the reference math (CPU torch).

The converter tests (test_converter.py) prove each layer family matches torch
in isolation; the backbone has its own numpy sparse-conv rulebook oracle
(test_backbone_parity.py). This file closes the remaining fidelity gap: the
COMPOSED post-backbone chain — disengagers -> bidirectional aligner ->
confidence -> neck fusers -> ortho-9D SVD pose heads (reference
models/DCL_Net.py:185-235) — and the full loss stack (reference
models/DCL_Net.py:261-311), verified end to end on identical inputs and
identical (converted) weights.

Protocol:
  1. Build the reference's post-backbone stages in CPU torch (re-expressed
     here from the reference's math, channel-first like the original).
  2. Export its state_dict with the reference's key naming, convert with
     convert_reference_state_dict, and graft onto our DCLNet param tree.
  3. Run OUR full model to get the 480-d interpolated features, hand those
     same features to the torch chain, and compare every output head.
  4. Feed both loss implementations identical predictions and compare all
     five loss scalars.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dcl_net_tpu.data.schema import make_batch  # noqa: E402
from dcl_net_tpu.data.synthetic import SyntheticPoseDataset  # noqa: E402
from dcl_net_tpu.models import DCLNet, dcl_losses  # noqa: E402
from dcl_net_tpu.train.checkpoints import convert_reference_state_dict  # noqa: E402

from tests.test_converter import _TorchDisengageBlock, _randomize_bn, _torch_head  # noqa: E402

GRID = (16, 16, 16)
UNIT = (0.024, 0.024, 0.024)
N = 128


class _Head(tnn.Module):
    """Head_MultiLayerPerceptron naming: the Sequential lives under
    `.layers` (reference models/Modules.py:173-201)."""

    def __init__(self, seq):
        super().__init__()
        self.layers = seq

    def forward(self, x):
        return self.layers(x)


def _torch_disengager(dim_out):
    # two BasicBlock_3DCONV 1x1 blocks, 480->256->dim_out
    # (reference models/DCL_Net.py:56-101)
    return tnn.Sequential(
        _TorchDisengageBlock(480, 256), _TorchDisengageBlock(256, dim_out)
    )


class TorchPostBackbone(tnn.Module):
    """The reference Network's post-backbone stages, channel-first
    (reference models/DCL_Net.py:185-235)."""

    def __init__(self):
        super().__init__()
        self.disengage_Xc_p1 = _torch_disengager(256)
        self.disengage_Xc_m1 = _torch_disengager(64)
        self.disengage_Xc_p2 = _torch_disengager(256)
        self.disengage_Xc_m2 = _torch_disengager(64)
        self.disengage_Yo_p1 = _torch_disengager(256)
        self.disengage_Yo_m1 = _torch_disengager(64)
        self.disengage_Yo_p2 = _torch_disengager(256)
        self.disengage_Yo_m2 = _torch_disengager(64)
        head = lambda *a: _Head(_torch_head(*a))
        self.regressor_Xo = head(256, [256, 128, 3], ["relu", "relu", "none"], [False] * 3)
        self.regressor_Yc = head(256, [256, 128, 3], ["relu", "relu", "none"], [False] * 3)
        self.regressor_conf = head(128, [128, 128, 1], ["relu", "relu", "none"], [False] * 3)
        self.regressor_conf_bi = head(128, [128, 128, 1], ["relu", "relu", "none"], [False] * 3)
        self.neck_fuser = head(512, [512, 512, 1024], ["relu"] * 3, [True] * 3)
        self.neck_fuser_bi = head(512, [512, 512, 1024], ["relu"] * 3, [True] * 3)
        self.regressor_rot = head(1024, [512, 128, 9], ["relu", "relu", "none"], [False] * 3)
        self.regressor_trans = head(1024, [512, 128, 3], ["relu", "relu", "none"], [False] * 3)

    @staticmethod
    def _aligner(ri_1, ri_2, re_2):
        # reference models/Modules.py:162-169 (softmax over the source axis)
        att = torch.softmax(torch.bmm(ri_2.transpose(1, 2), ri_1), dim=1)
        return torch.bmm(re_2, att), att

    @staticmethod
    def _ortho9d2matrix(x_raw, y_raw, z_raw):
        # reference models/DCL_Net.py:15-36 (normalize + SVD det-fix)
        def norm(v):
            return v / (v.pow(2).sum(1, keepdim=True).sqrt() + 1e-8)

        m = torch.stack([norm(x_raw), norm(y_raw), norm(z_raw)], dim=2)
        u, s, v = torch.svd(m)
        sigma = torch.ones(m.shape[0], 3)
        sigma[:, -1] = torch.bmm(u, v.transpose(1, 2)).det()
        return u @ torch.diag_embed(sigma) @ v.transpose(1, 2)

    def forward(self, f_xc, f_yo):
        # f_xc: [B, 480, N], f_yo: [B, 480, M]
        as5d = lambda f: f[:, :, :, None, None]
        sq = lambda f: f.squeeze(-1).squeeze(-1)
        xc_p1 = sq(self.disengage_Xc_p1(as5d(f_xc)))
        xc_m1 = sq(self.disengage_Xc_m1(as5d(f_xc)))
        xc_p2 = sq(self.disengage_Xc_p2(as5d(f_xc)))
        xc_m2 = sq(self.disengage_Xc_m2(as5d(f_xc)))
        yo_p1 = sq(self.disengage_Yo_p1(as5d(f_yo)))
        yo_m1 = sq(self.disengage_Yo_m1(as5d(f_yo)))
        yo_p2 = sq(self.disengage_Yo_p2(as5d(f_yo)))
        yo_m2 = sq(self.disengage_Yo_m2(as5d(f_yo)))

        f_xo_p, att = self._aligner(xc_m1, yo_m1, yo_p1)
        xo_pred = self.regressor_Xo(f_xo_p)
        f_yc_p, att_bi = self._aligner(yo_m2, xc_m2, xc_p2)
        yc_pred = self.regressor_Yc(f_yc_p)

        f_xo_m = torch.bmm(yo_m1, att)
        f_m1 = torch.cat([xc_m1, f_xo_m], dim=1)
        f_yc_m = torch.bmm(xc_m2, att_bi)
        f_m2 = torch.cat([f_yc_m, yo_m2], dim=1)
        conf = torch.sigmoid(torch.cat(
            [self.regressor_conf(f_m1), self.regressor_conf_bi(f_m2)], dim=2
        ))
        conf_softmax = torch.softmax(conf, dim=2)

        f_p1 = self.neck_fuser(torch.cat([xc_p1, f_xo_p], dim=1))
        f_p2 = self.neck_fuser_bi(torch.cat([f_yc_p, yo_p2], dim=1))
        f_p = torch.cat([f_p1, f_p2], dim=2)
        f_p_wei = torch.sum(f_p * conf_softmax, dim=2, keepdim=True)

        ortho9d = self.regressor_rot(f_p_wei).squeeze(-1)
        rot = self._ortho9d2matrix(ortho9d[:, :3], ortho9d[:, 3:6], ortho9d[:, 6:])
        trans = self.regressor_trans(f_p_wei).squeeze(-1)
        return {
            "rot_pred": rot, "trans_pred": trans,
            "conf": conf.squeeze(1),
            "Xo_pred": xo_pred.transpose(1, 2),
            "Yc_pred": yc_pred.transpose(1, 2),
            "F_Xo_p": f_xo_p,
        }


def torch_reference_losses(pred, labels, sym_flag):
    """The reference loss stack re-expressed (models/DCL_Net.py:261-311)."""
    l2 = lambda a, b: torch.norm(a - b, dim=2)

    def cd(a, b):
        d = torch.norm(a.unsqueeze(2) - b.unsqueeze(1), dim=3)
        return 0.5 * (torch.min(d, 2)[0] + torch.min(d, 1)[0])

    rot_pred, trans_pred = pred["rot_pred"], pred["trans_pred"]
    rot_gt, trans_gt = labels["rot_gt"], labels["trans_gt"]
    pts_tmp, pts_inp = labels["points_tmp"], labels["points_inp"]
    sym = sym_flag.unsqueeze(1)
    conf = pred["conf"]

    tmp_pred = torch.bmm(pts_tmp, rot_pred.transpose(1, 2)) + trans_pred.unsqueeze(1)
    tmp_gt = torch.bmm(pts_tmp, rot_gt.transpose(1, 2)) + trans_gt.unsqueeze(1)
    loss_pose = ((1 - sym) * l2(tmp_pred, tmp_gt)
                 + sym * cd(tmp_pred, tmp_gt)).mean(dim=1).mean()

    inp_cano_pred = torch.bmm(pts_inp - trans_pred.unsqueeze(1), rot_pred).detach()
    inp_cano_gt = torch.bmm(pts_inp - trans_gt.unsqueeze(1), rot_gt).detach()
    loss_xo = (1 - sym) * l2(pred["Xo_pred"], inp_cano_gt) + 0.5 * sym * (
        cd(pred["Xo_pred"], pts_tmp) + l2(pred["Xo_pred"], inp_cano_pred))
    loss_yc = (1 - sym) * l2(pred["Yc_pred"], tmp_gt) + 0.5 * sym * (
        cd(pred["Yc_pred"], tmp_gt) + l2(pred["Yc_pred"], tmp_pred.detach()))
    loss_conf = torch.mean(
        torch.cat([loss_xo, loss_yc], dim=1).detach() * conf - 0.01 * torch.log(conf)
    )
    loss_xo_, loss_yc_ = loss_xo.mean(), loss_yc.mean()
    return {
        "loss_pose": loss_pose, "loss_Xo": loss_xo_, "loss_Yc": loss_yc_,
        "loss_conf": loss_conf,
        "loss_all": loss_pose + 5 * loss_xo_ + loss_yc_ + loss_conf,
    }


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(11)
    torch.manual_seed(11)
    tmodel = TorchPostBackbone()
    with torch.no_grad():
        _randomize_bn(tmodel, rng)
    tmodel.eval()

    # state_dict with the reference's exact key naming -> our param tree
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


def test_composed_forward_matches_reference_torch(setup):
    tmodel, model, variables, batch = setup

    ours = model.apply(variables, batch, train=False)

    # identical 480-d interpolated features into the torch chain
    def get_feats(mdl, b):
        _, fx = mdl._encode(mdl.backbone_inp, mdl.point_feats_inp,
                            b["inp"]["feats"], b["inp"]["voxel_idx"], False)
        _, fy = mdl._encode(mdl.backbone_tmp, mdl.point_feats_tmp,
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


def test_loss_stack_matches_reference_torch(setup):
    """Both loss implementations on IDENTICAL predictions -> identical
    scalars (reference models/DCL_Net.py:261-311 incl. the 5/1/1 weights)."""
    _, model, variables, batch = setup
    ours_pred = model.apply(variables, batch, train=False)
    ours_losses = dcl_losses(ours_pred, batch)

    t = lambda x: torch.tensor(np.asarray(x))
    tpred = {k: t(v) for k, v in ours_pred.items()
             if k in ("rot_pred", "trans_pred", "conf", "Xo_pred", "Yc_pred")}
    tlabels = {
        "rot_gt": t(batch["labels"]["rot_gt"]),
        "trans_gt": t(batch["labels"]["trans_gt"]),
        "points_tmp": t(ours_pred["points_tmp"]),
        "points_inp": t(ours_pred["points_inp"]),
    }
    with torch.no_grad():
        ref_losses = torch_reference_losses(tpred, tlabels, t(batch["sym_flag"]))

    for k in ("loss_pose", "loss_Xo", "loss_Yc", "loss_conf", "loss_all"):
        np.testing.assert_allclose(
            float(ours_losses[k]), float(ref_losses[k]), rtol=1e-5, atol=1e-6,
            err_msg=k,
        )
