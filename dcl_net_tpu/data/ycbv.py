"""YCB-Video datasets (train + test) producing fixed-shape batches.

Faithful rebuild of the reference loaders:
- train: reference YCBV/dataloader_train_YCBV.py — random instance choice,
  bbox snap, depth lift with the two camera intrinsics sets, centroid
  centering, SE(3) augmentation, volume filter, 1024-point resample.
- test: reference YCBV/dataloader_test_YCBV.py — iterates ALL gt instances
  of each frame using FFB6D-predicted masks+rois from
  datasets/YCBV_Masks/Masks_FFB6D; undetected instances are recorded as
  lost detections (reference all_flags=0, :116-123).

Differences by design (fixed shapes for XLA): instances are padded to a
static per-batch capacity with valid flags instead of ragged batches, and
voxelization happens in-graph (no CPU hash map in collate).
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional

import numpy as np

from dcl_net_tpu.data import preprocess as pp
from dcl_net_tpu.data.png import imread
from dcl_net_tpu.data.ply import read_ply
from dcl_net_tpu.registry import DATASETS

# Camera intrinsics (reference YCBV/dataloader_train_YCBV.py:83-91)
CAM_1 = dict(cx=312.9869, cy=241.3109, fx=1066.778, fy=1067.487)
CAM_2 = dict(cx=323.7872, cy=279.6921, fx=1077.836, fy=1078.189)
TEST_CAM_SCALE = 10000.0
SYMMETRY_OBJ_IDX = [12, 15, 18, 19, 20]  # 0-based (reference :98)
NUM_CLASSES = 21


def _load_cads(cad_dir: str, classes_file: str, n_tmp: int, n_downsample: int = 1024):
    """Load the 21 CAD clouds exactly like the reference init
    (YCBV/dataloader_train_YCBV.py:53-76): np.random.seed(1), choose n_tmp
    points without replacement, colors minus ImageNet mean, points in mm."""
    with open(classes_file) as f:
        class_names = [line.strip() for line in f if line.strip()]
    rng_state = np.random.get_state()
    np.random.seed(1)
    rgb_cad, pc_cad, pc_cad_ds, radius = {}, {}, {}, {}
    for class_id, name in enumerate(class_names, start=1):
        ply = read_ply(os.path.join(cad_dir, name + "_pc.ply"))
        pts, cols = ply["points"], ply.get("colors")
        if cols is None:  # colorless CAD: zero colors, like the LM loader
            cols = np.zeros_like(pts)
        n_avail = pts.shape[0]
        if n_avail < n_tmp:
            choose = np.random.choice(n_avail, n_tmp)
        else:
            choose = np.random.choice(n_avail, n_tmp, replace=False)
        rgb_cad[class_id] = cols[choose] - pp.IMAGENET_MEAN
        pc_cad[class_id] = pts[choose] * 1000.0
        choose_ds = np.random.choice(n_avail, n_downsample, replace=False)
        pc_cad_ds[class_id] = pts[choose_ds] * 1000.0
        radius[class_id] = float(np.linalg.norm(pts[choose], axis=1).max())
    np.random.set_state(rng_state)
    return class_names, rgb_cad, pc_cad, pc_cad_ds, radius


def roi_bbox(posecnn_rois: np.ndarray, idx: int):
    """FFB6D/PoseCNN roi -> snapped bbox
    (reference YCBV/dataloader_test_YCBV.py:266-303)."""
    rmin = max(int(posecnn_rois[idx][3]) + 1, 0)
    rmax = min(int(posecnn_rois[idx][5]) - 1, 480)
    cmin = max(int(posecnn_rois[idx][2]) + 1, 0)
    cmax = min(int(posecnn_rois[idx][4]) - 1, 640)
    r_b = rmax - rmin
    for tt in range(len(pp.BORDER_LIST) - 1):
        if pp.BORDER_LIST[tt] < r_b < pp.BORDER_LIST[tt + 1]:
            r_b = pp.BORDER_LIST[tt + 1]
            break
    c_b = cmax - cmin
    for tt in range(len(pp.BORDER_LIST) - 1):
        if pp.BORDER_LIST[tt] < c_b < pp.BORDER_LIST[tt + 1]:
            c_b = pp.BORDER_LIST[tt + 1]
            break
    center = [(rmin + rmax) // 2, (cmin + cmax) // 2]
    rmin, rmax = center[0] - r_b // 2, center[0] + r_b // 2
    cmin, cmax = center[1] - c_b // 2, center[1] + c_b // 2
    if rmin < 0:
        rmax += -rmin
        rmin = 0
    if cmin < 0:
        cmax += -cmin
        cmin = 0
    if rmax > 480:
        rmin -= rmax - 480
        rmax = 480
    if cmax > 640:
        cmin -= cmax - 640
        cmax = 640
    return rmin, rmax, cmin, cmax


@DATASETS.register("ycbv_train")
class YCBVTrainDataset:
    def __init__(self, cfg, root: str, list_file: Optional[str] = None,
                 assets_dir: Optional[str] = None):
        assets = assets_dir or os.path.join(root, "..")
        self.root = root
        self.n_inp = int(cfg.input_size)
        self.n_tmp = int(cfg.tmp_size)
        self.unit = np.asarray(cfg.unit_voxel_extent, np.float32)
        self.limit = np.asarray(cfg.voxel_num_limit, np.float32)
        self.total = self.unit * self.limit
        list_file = list_file or os.path.join(assets, "train_data_list.txt")
        with open(list_file) as f:
            self.list = [line.strip() for line in f if line.strip()]
        classes = os.path.join(assets, "classes.txt")
        cads = os.path.join(assets, "CADs")
        (self.class_names, self.rgb_cad, self.pc_cad, self.pc_cad_ds,
         self.radius) = _load_cads(cads, classes, self.n_tmp)
        self.min_pt = 50
        # device-side preprocessing (opt-in, cfg.device_preprocess): emit RAW
        # candidate pixels (depth u16 / row-col i16 / rgb u8, padded to
        # device_cand_k) and let the jitted graph do lift/center/aug/filter/
        # resample/assembly (data/device_preprocess.py) — the host tail
        # drops from ~5 ms/sample to the pixel gather
        # cfg may be a Config or any attribute bag (the golden tests pass a
        # SimpleNamespace); optional keys go through getattr-style lookup
        _get = (cfg.get if hasattr(cfg, "get")
                else lambda k, d=None: getattr(cfg, k, d))
        self.raw_mode = bool(_get("device_preprocess", False))
        self.cand_k = int(_get("device_cand_k", 8192))
        # amortize the PNG decode (~10 ms/frame, the dominant host cost)
        # over several instance draws of the SAME frame (raw mode only):
        # __getitem__ returns a LIST of samples_per_frame raw samples and
        # BatchLoader(samples_per_item=k) flattens them. Opt-in because
        # same-frame samples are correlated within a batch (the reference
        # draws one instance per frame per epoch).
        self.samples_per_frame = (
            int(_get("samples_per_frame", 1)) if self.raw_mode else 1)

    def __len__(self):
        return len(self.list)

    def template_bank(self):
        """Per-class template inputs {feats [C,M,7], voxel_idx [C,M,3]}.
        Training templates are per-class constants (CAD sampled once at
        init, like the reference :59-76), so banked-template training
        (cfg.train_template_bank) encodes each class once per step."""
        feats, vidx = [], []
        for c in sorted(self.pc_cad):
            pts = (self.pc_cad[c] / 1000.0).astype(np.float32)
            f, v = pp.assemble_features(
                pts, self.rgb_cad[c].astype(np.float32),
                self.unit, self.total, self.limit,
            )
            feats.append(f)
            vidx.append(v)
        return {"feats": np.stack(feats), "voxel_idx": np.stack(vidx)}

    def _intrinsics(self, path: str) -> Dict[str, float]:
        # videos >= 60 use the second camera (reference :113-122)
        if path[:8] != "data_syn" and int(path[5:9]) >= 60:
            return CAM_2
        return CAM_1

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        import scipy.io as scio

        rng = np.random  # module-level RNG like the reference workers
        path = self.list[index]
        img = imread(f"{self.root}/{path}-color.png")[:, :, :3]
        depth = imread(f"{self.root}/{path}-depth.png")
        label = imread(f"{self.root}/{path}-label.png")
        meta = scio.loadmat(f"{self.root}/{path}-meta.mat")
        objs = meta["cls_indexes"].flatten().astype(np.int32)
        cam = self._intrinsics(path)

        mask_depth = depth != 0

        if self.raw_mode:
            # decode once, draw samples_per_frame instances from the frame
            # (the decode is the dominant host cost; see device_preprocess)
            out = [
                self._draw_raw(img, depth, label, objs, meta, cam, mask_depth,
                               rng)
                for _ in range(self.samples_per_frame)
            ]
            return out if self.samples_per_frame > 1 else out[0]

        # random instance with enough pixels (reference :126-132)
        for _ in range(100):
            idx = rng.randint(0, len(objs))
            mask_label = label == objs[idx]
            mask = mask_label & mask_depth
            if mask.sum() > self.min_pt:
                break
        else:
            return self._invalid()

        rmin, rmax, cmin, cmax = pp.get_bbox(mask_label)
        target_r = meta["poses"][:, :, idx][:, 0:3].astype(np.float32)
        target_t = meta["poses"][:, :, idx][:, 3].astype(np.float32)

        choose = mask[rmin:rmax, cmin:cmax].flatten().nonzero()[0]
        if len(choose) < self.min_pt:
            return self._invalid()

        rgb = pp.normalize_rgb(
            img[rmin:rmax, cmin:cmax].reshape(-1, 3)[choose]
        )
        cam_scale = float(meta["factor_depth"][0][0])
        cloud = pp.depth_to_cloud(
            depth, choose, rmin, rmax, cmin, cmax,
            cam["cx"], cam["cy"], cam["fx"], cam["fy"], cam_scale,
        )
        centroid = cloud.mean(axis=0)
        cloud = (cloud - centroid).astype(np.float32)
        target_t = target_t - centroid.astype(np.float32)

        # module rng straight through: the draw sequence (instance randint,
        # 3 angle uniforms, 3 python-random translation uniforms, resample
        # choice) matches the reference loader call for call, so same-seed
        # samples are bit-comparable (tests/test_golden_data.py)
        cloud, target_r, target_t = pp.se3_augment(
            cloud, target_r, target_t, rng, trans_rng=random
        )

        res = pp.filter_and_resample(cloud, rgb, self.total, self.n_inp, rng,
                                     self.min_pt)
        if res is None:
            return self._invalid()
        cloud, rgb = res
        feats_inp, vidx_inp = pp.assemble_features(cloud, rgb, self.unit, self.total, self.limit)

        obj_id = int(objs[idx])
        model_points = (self.pc_cad[obj_id] / 1000.0).astype(np.float32)
        feats_tmp, vidx_tmp = pp.assemble_features(
            model_points, self.rgb_cad[obj_id].astype(np.float32),
            self.unit, self.total, self.limit,
        )
        return {
            "inp_feats": feats_inp, "inp_voxel_idx": vidx_inp,
            "tmp_feats": feats_tmp, "tmp_voxel_idx": vidx_tmp,
            "rot_gt": target_r, "trans_gt": target_t,
            "obj_idx": np.int32(obj_id - 1),
            "sym_flag": np.float32(1.0 if (obj_id - 1) in SYMMETRY_OBJ_IDX else 0.0),
            "valid": 1.0,
            "radius": np.float32(self.radius[obj_id]),
        }

    def _invalid(self):
        n, m = self.n_inp, self.n_tmp
        return {
            "inp_feats": np.zeros((n, 7), np.float32),
            "inp_voxel_idx": np.zeros((n, 3), np.int32),
            "tmp_feats": np.zeros((m, 7), np.float32),
            "tmp_voxel_idx": np.zeros((m, 3), np.int32),
            "rot_gt": np.zeros((3, 3), np.float32),
            "trans_gt": np.zeros(3, np.float32),
            "obj_idx": np.int32(-1), "sym_flag": np.float32(-1.0),
            "valid": 0.0, "radius": np.float32(-1.0),
        }

    # ------------------------------------------------------------------
    # raw-candidate mode for device-side preprocessing
    # ------------------------------------------------------------------
    def _draw_raw(self, img, depth, label, objs, meta, cam, mask_depth, rng):
        """One instance draw -> raw candidate sample (reference instance
        choice :126-132 + bbox snap; the numpy tail moves in-graph)."""
        for _ in range(100):
            idx = rng.randint(0, len(objs))
            mask_label = label == objs[idx]
            mask = mask_label & mask_depth
            if mask.sum() > self.min_pt:
                break
        else:
            return self._invalid_raw()
        rmin, rmax, cmin, cmax = pp.get_bbox(mask_label)
        target_r = meta["poses"][:, :, idx][:, 0:3].astype(np.float32)
        target_t = meta["poses"][:, :, idx][:, 3].astype(np.float32)
        r_loc, c_loc = np.nonzero(mask[rmin:rmax, cmin:cmax])
        if len(r_loc) < self.min_pt:
            return self._invalid_raw()
        cam_scale = float(meta["factor_depth"][0][0])
        return self._raw_sample(
            img, depth, int(objs[idx]), rmin + r_loc, cmin + c_loc,
            cam, cam_scale, target_r, target_t,
        )

    def _tmp_branch(self, obj_id: int):
        model_points = (self.pc_cad[obj_id] / 1000.0).astype(np.float32)
        return pp.assemble_features(
            model_points, self.rgb_cad[obj_id].astype(np.float32),
            self.unit, self.total, self.limit,
        )

    def _raw_sample(self, img, depth, obj_id, rows, cols, cam, cam_scale,
                    target_r, target_t):
        """Raw candidate pixels for the device preprocessing graph
        (data/device_preprocess.py): depth u16 / row-col i16 / rgb u8 at the
        masked crop pixels, padded to cand_k. The lift/center/aug/filter/
        resample/assembly that __getitem__ otherwise does in numpy
        (reference YCBV/dataloader_train_YCBV.py:150-205) runs in-graph."""
        k = self.cand_k
        n = len(rows)
        if n > k:
            # rare (cand_k=8192 vs typical 2-20k mask pixels only for very
            # close objects): thin the candidate pool uniformly
            sel = np.random.choice(n, k, replace=False)
            rows, cols = rows[sel], cols[sel]
            n = k
        cand_depth = np.zeros(k, np.uint16)
        cand_rc = np.zeros((k, 2), np.int16)
        cand_rgb = np.zeros((k, 3), np.uint8)
        cand_depth[:n] = depth[rows, cols]
        cand_rc[:n, 0] = rows
        cand_rc[:n, 1] = cols
        cand_rgb[:n] = img[rows, cols]
        feats_tmp, vidx_tmp = self._tmp_branch(obj_id)
        return {
            "cand_depth": cand_depth, "cand_rc": cand_rc,
            "cand_rgb": cand_rgb, "n_cand": np.int32(n),
            "cam": np.asarray(
                [cam["cx"], cam["cy"], cam["fx"], cam["fy"], cam_scale],
                np.float32),
            "tmp_feats": feats_tmp, "tmp_voxel_idx": vidx_tmp,
            "rot_gt": target_r, "trans_gt": target_t,
            "obj_idx": np.int32(obj_id - 1),
            "sym_flag": np.float32(
                1.0 if (obj_id - 1) in SYMMETRY_OBJ_IDX else 0.0),
            "valid": 1.0,
            "radius": np.float32(self.radius[obj_id]),
        }

    def _invalid_raw(self):
        k, m = self.cand_k, self.n_tmp
        return {
            "cand_depth": np.zeros(k, np.uint16),
            "cand_rc": np.zeros((k, 2), np.int16),
            "cand_rgb": np.zeros((k, 3), np.uint8),
            "n_cand": np.int32(0),
            "cam": np.asarray([1.0, 1.0, 1.0, 1.0, 1.0], np.float32),
            "tmp_feats": np.zeros((m, 7), np.float32),
            "tmp_voxel_idx": np.zeros((m, 3), np.int32),
            "rot_gt": np.zeros((3, 3), np.float32),
            "trans_gt": np.zeros(3, np.float32),
            "obj_idx": np.int32(-1), "sym_flag": np.float32(-1.0),
            "valid": 0.0, "radius": np.float32(-1.0),
        }


@DATASETS.register("ycbv_test")
class YCBVTestDataset:
    """Per-frame eval dataset with FFB6D masks (reference
    YCBV/dataloader_test_YCBV.py). __getitem__ yields the frame's instance
    samples + lost-detection records; `frames()` iterates padded batches."""

    def __init__(self, cfg, root: str, masks_dir: Optional[str] = None,
                 list_file: Optional[str] = None, assets_dir: Optional[str] = None):
        assets = assets_dir or os.path.join(root, "..")
        self.root = root
        self.masks_dir = masks_dir or os.path.join(assets, "YCBV_Masks", "Masks_FFB6D")
        self.n_inp = int(cfg.input_size)
        self.n_tmp = int(cfg.tmp_size)
        self.unit = np.asarray(cfg.unit_voxel_extent, np.float32)
        self.limit = np.asarray(cfg.voxel_num_limit, np.float32)
        self.total = self.unit * self.limit
        list_file = list_file or os.path.join(assets, "test_data_list.txt")
        with open(list_file) as f:
            self.list = [line.strip() for line in f if line.strip()]
        classes = os.path.join(assets, "classes.txt")
        cads = os.path.join(assets, "CADs")
        (self.class_names, self.rgb_cad, self.pc_cad, self.pc_cad_ds,
         self.radius) = _load_cads(cads, classes, self.n_tmp)
        self.min_pt = 50
        # device-side preprocessing (eval flavor): emit raw candidate pixels
        # and run lift/center/clamped-filter/resample in-graph with the test
        # loader's keep-clamp quirk (data/device_preprocess.py,
        # eval_keep_clamp)
        _get = (cfg.get if hasattr(cfg, "get")
                else lambda k, d=None: getattr(cfg, k, d))
        self.raw_mode = bool(_get("device_preprocess", False))
        self.cand_k = int(_get("device_cand_k", 8192))

    def __len__(self):
        return len(self.list)

    def model_points_array(self, models_dir: Optional[str] = None,
                           n_points: int = 2620) -> np.ndarray:
        """[num_classes, P, 3] CAD clouds in metres for metric computation.

        The reference eval scores against the first 2620 rows of each class's
        ``models/<name>/points.xyz`` (reference tools/test_YCBV_stage1.py:
        147-169); when that directory exists we read it, otherwise we fall
        back to the sampled template clouds.
        """
        if models_dir and os.path.isdir(models_dir):
            clouds = []
            for name in self.class_names:
                path = os.path.join(models_dir, name, "points.xyz")
                pts = np.loadtxt(path, dtype=np.float32)[:n_points, :3]
                clouds.append(pts)
            return np.stack(clouds).astype(np.float32)
        return np.stack(
            [self.pc_cad[c] / 1000.0 for c in sorted(self.pc_cad)]
        ).astype(np.float32)

    def template_bank(self):
        """Per-class template inputs {feats [C,M,7], voxel_idx [C,M,3]} for
        the evaluator's template-feature cache."""
        feats, vidx = [], []
        for c in sorted(self.pc_cad):
            pts = (self.pc_cad[c] / 1000.0).astype(np.float32)
            f, v = pp.assemble_features(
                pts, self.rgb_cad[c].astype(np.float32),
                self.unit, self.total, self.limit,
            )
            feats.append(f)
            vidx.append(v)
        return {"feats": np.stack(feats), "voxel_idx": np.stack(vidx)}

    def __getitem__(self, index: int):
        import scipy.io as scio

        rng = np.random
        path = self.list[index]
        img = imread(f"{self.root}/{path}-color.png")[:, :, :3]
        depth = imread(f"{self.root}/{path}-depth.png")
        mask_depth = depth != 0
        posecnn_meta = scio.loadmat(f"{self.masks_dir}/{index:06d}.mat")
        label = np.array(posecnn_meta["labels"])
        rois = np.array(posecnn_meta["rois"])
        gt_meta = scio.loadmat(f"{self.root}/{path}-meta.mat")
        gt_obj = gt_meta["cls_indexes"].flatten().astype(np.int32)

        samples: List[Dict] = []
        lost: List[Dict] = []
        for idx in range(gt_obj.shape[0]):
            obj_id = int(gt_obj[idx])
            target_r = gt_meta["poses"][:, :, idx][:, 0:3].astype(np.float32)
            target_t = gt_meta["poses"][:, :, idx][:, 3].astype(np.float32)

            detected = np.sum(rois[:, 1] == obj_id) > 0
            choose = None
            if detected:
                roi_i = np.where(rois[:, 1] == obj_id)[0][0]
                rmin, rmax, cmin, cmax = roi_bbox(rois, roi_i)
                mask = (label == obj_id) & mask_depth
                choose = mask[rmin:rmax, cmin:cmax].flatten().nonzero()[0]
            if not detected or choose is None or choose.shape[0] == 0:
                lost.append({"obj_idx": obj_id - 1, "rot_gt": target_r,
                             "trans_gt": target_t, "gt_pos": idx})
                continue

            if self.raw_mode:
                w = cmax - cmin
                samples.append(self._raw_sample(
                    img, depth, obj_id,
                    rmin + choose // w, cmin + choose % w,
                    target_r, target_t, idx,
                ))
                continue

            rgb = pp.normalize_rgb(img[rmin:rmax, cmin:cmax].reshape(-1, 3)[choose])
            cloud = pp.depth_to_cloud(
                depth, choose, rmin, rmax, cmin, cmax,
                CAM_1["cx"], CAM_1["cy"], CAM_1["fx"], CAM_1["fy"],
                TEST_CAM_SCALE,
            )
            centroid = cloud.mean(axis=0)
            cloud = (cloud - centroid).astype(np.float32)
            target_t = target_t - centroid.astype(np.float32)

            # eval keeps out-of-volume points when too few remain
            # (reference :164-180: filter only if >32 survive, else clamp)
            keep = (
                (np.abs(cloud[:, 0]) < self.total[0] * 0.5)
                & (np.abs(cloud[:, 1]) < self.total[1] * 0.5)
                & (np.abs(cloud[:, 2]) < self.total[2] * 0.5)
            )
            if keep.sum() > 32:
                cloud, rgb = cloud[keep], rgb[keep]
            if cloud.shape[0] > self.n_inp:
                sel = rng.choice(cloud.shape[0], self.n_inp, replace=False)
            else:
                sel = rng.choice(cloud.shape[0], self.n_inp)
            cloud, rgb = cloud[sel], rgb[sel]
            feats_inp, vidx_inp = pp.assemble_features(cloud, rgb, self.unit, self.total, self.limit)

            model_points = (self.pc_cad[obj_id] / 1000.0).astype(np.float32)
            feats_tmp, vidx_tmp = pp.assemble_features(
                model_points, self.rgb_cad[obj_id].astype(np.float32),
                self.unit, self.total, self.limit,
            )
            samples.append({
                "inp_feats": feats_inp, "inp_voxel_idx": vidx_inp,
                "tmp_feats": feats_tmp, "tmp_voxel_idx": vidx_tmp,
                "rot_gt": target_r, "trans_gt": target_t,
                "obj_idx": np.int32(obj_id - 1),
                "sym_flag": np.float32(1.0 if (obj_id - 1) in SYMMETRY_OBJ_IDX else 0.0),
                "valid": 1.0, "centroid": centroid.astype(np.float32),
                "gt_pos": idx,
            })
        return {"samples": samples, "lost": lost, "path": path}

    def _raw_sample(self, img, depth, obj_id, rows, cols,
                    target_r, target_t, gt_pos):
        """Raw candidate pixels for the device preprocessing graph, eval
        flavor (no aug; lift/center/clamped-filter/resample run in-graph
        with eval_keep_clamp — reference YCBV/dataloader_test_YCBV.py:
        164-180 filters only when >32 candidates survive)."""
        k = self.cand_k
        n = len(rows)
        if n > k:
            sel = np.random.choice(n, k, replace=False)
            rows, cols = rows[sel], cols[sel]
            n = k
        cand_depth = np.zeros(k, np.uint16)
        cand_rc = np.zeros((k, 2), np.int16)
        cand_rgb = np.zeros((k, 3), np.uint8)
        cand_depth[:n] = depth[rows, cols]
        cand_rc[:n, 0] = rows
        cand_rc[:n, 1] = cols
        cand_rgb[:n] = img[rows, cols]
        model_points = (self.pc_cad[obj_id] / 1000.0).astype(np.float32)
        feats_tmp, vidx_tmp = pp.assemble_features(
            model_points, self.rgb_cad[obj_id].astype(np.float32),
            self.unit, self.total, self.limit,
        )
        return {
            "cand_depth": cand_depth, "cand_rc": cand_rc,
            "cand_rgb": cand_rgb, "n_cand": np.int32(n),
            "cam": np.asarray(
                [CAM_1["cx"], CAM_1["cy"], CAM_1["fx"], CAM_1["fy"],
                 TEST_CAM_SCALE], np.float32),
            "tmp_feats": feats_tmp, "tmp_voxel_idx": vidx_tmp,
            "rot_gt": target_r, "trans_gt": target_t,
            "obj_idx": np.int32(obj_id - 1),
            "sym_flag": np.float32(
                1.0 if (obj_id - 1) in SYMMETRY_OBJ_IDX else 0.0),
            "valid": 1.0, "gt_pos": gt_pos,
        }

    def invalid_row(self) -> Dict:
        """A valid=0 placeholder row (lost detection / padding); input
        features are replaced by a real sample's in make_batch."""
        if self.raw_mode:
            k, m = self.cand_k, self.n_tmp
            return {
                "cand_depth": np.zeros(k, np.uint16),
                "cand_rc": np.zeros((k, 2), np.int16),
                "cand_rgb": np.zeros((k, 3), np.uint8),
                "n_cand": np.int32(0),
                "cam": np.asarray([1.0, 1.0, 1.0, 1.0, 1.0], np.float32),
                "tmp_feats": np.zeros((m, 7), np.float32),
                "tmp_voxel_idx": np.zeros((m, 3), np.int32),
                "rot_gt": np.zeros((3, 3), np.float32),
                "trans_gt": np.zeros(3, np.float32),
                "obj_idx": np.int32(0),
                "sym_flag": np.float32(0.0),
                "valid": 0.0,
            }
        n, m = self.n_inp, self.n_tmp
        return {
            "inp_feats": np.zeros((n, 7), np.float32),
            "inp_voxel_idx": np.zeros((n, 3), np.int32),
            "tmp_feats": np.zeros((m, 7), np.float32),
            "tmp_voxel_idx": np.zeros((m, 3), np.int32),
            "rot_gt": np.zeros((3, 3), np.float32),
            "trans_gt": np.zeros(3, np.float32),
            "obj_idx": np.int32(0),
            "sym_flag": np.float32(0.0),
            "valid": 0.0,
        }

    def frames(self, pad_to: Optional[int] = None):
        """Reference-protocol iteration: ONE batch per image holding exactly
        that image's ground-truth instances in gt order, with lost detections
        as valid=0 rows carrying their true labels (reference
        YCBV/dataloader_test_YCBV.py:116-144 marks all_flags=0 in place and
        :259-260 batches all instances of one image together). Yields
        (batch_dict, path)."""
        from dcl_net_tpu.data.schema import make_batch

        if self.raw_mode:
            raise ValueError(
                "frames() per-image protocol iteration needs the numpy "
                "pipeline — construct the dataset without device_preprocess "
                "(the device path serves the EvalFrameLoader throughput "
                "protocol)")
        for i in range(len(self)):
            frame = self[i]
            rows = list(frame["samples"])
            for lost in frame["lost"]:
                row = self.invalid_row()
                row.update(
                    rot_gt=lost["rot_gt"], trans_gt=lost["trans_gt"],
                    obj_idx=np.int32(lost["obj_idx"]), valid=0.0,
                    gt_pos=lost["gt_pos"],
                )
                rows.append(row)
            rows.sort(key=lambda r: r["gt_pos"])
            yield make_batch(rows, pad_to=pad_to).to_dict(), frame["path"]
