"""On-disk dataset fixtures mimicking YCB-Video / LineMOD / LMO formats."""

from __future__ import annotations

import os

import numpy as np


def _write_ply_ascii(path, pts, colors, faces=None):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        if faces is not None:
            f.write(f"element face {len(faces)}\n")
            f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        for p, c in zip(pts, colors):
            f.write(f"{p[0]} {p[1]} {p[2]} {int(c[0])} {int(c[1])} {int(c[2])}\n")
        if faces is not None:
            for face in faces:
                f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def _sphere_points(n, radius, rng):
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v * radius


def _render_sphere(depth, label, cx, cy, fx, fy, center, radius, label_value,
                   depth_scale):
    """Rasterize a crude depth sphere into the maps."""
    h, w = depth.shape[:2]
    u = int(cx + center[0] / center[2] * fx)
    v = int(cy + center[1] / center[2] * fy)
    r_pix = max(int(radius / center[2] * fx), 6)
    yy, xx = np.mgrid[0:h, 0:w]
    m = (yy - v) ** 2 + (xx - u) ** 2 < r_pix ** 2
    depth[m] = int(center[2] * depth_scale)
    if label.ndim == 3:
        label[m] = label_value
    else:
        label[m] = label_value
    return m


def make_ycbv_fixture(tmpdir: str, n_classes: int = 3, n_frames: int = 2,
                      seed: int = 0, second_video: bool = False):
    """Create a miniature YCB-Video tree + assets. Returns (root, assets).

    second_video adds frames under data/0060 (videos >= 60 use the second
    camera intrinsics set, reference YCBV/dataloader_train_YCBV.py:113-122)."""
    from PIL import Image
    import scipy.io as sio

    rng = np.random.RandomState(seed)
    root = os.path.join(tmpdir, "YCB_Video_Dataset", "root")
    assets = os.path.join(tmpdir, "YCB_Video_Dataset")
    cad_dir = os.path.join(assets, "CADs")
    masks_dir = os.path.join(assets, "YCBV_Masks", "Masks_FFB6D")
    video_ids = ["0001"] + (["0060"] if second_video else [])
    for vid in video_ids:
        os.makedirs(os.path.join(root, "data", vid), exist_ok=True)
    os.makedirs(cad_dir, exist_ok=True)
    os.makedirs(masks_dir, exist_ok=True)

    names = [f"obj_{i:02d}" for i in range(1, n_classes + 1)]
    with open(os.path.join(assets, "classes.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    for name in names:
        pts = _sphere_points(3000, 0.04, rng)  # metres
        cols = rng.randint(0, 255, (3000, 3))
        _write_ply_ascii(os.path.join(cad_dir, name + "_pc.ply"), pts, cols)

    # per-video intrinsics: videos >= 60 use the second camera (reference
    # YCBV/dataloader_train_YCBV.py:83-91) — render 0060 frames with CAM_2
    # so the depth geometry is consistent with the GT poses under the
    # loaders' own lift
    cam_1 = dict(cx=312.9869, cy=241.3109, fx=1066.778, fy=1067.487)
    cam_2 = dict(cx=323.7872, cy=279.6921, fx=1077.836, fy=1078.189)
    frames = []
    for vid in video_ids:
        for fi in range(n_frames):
            frames.append(f"data/{vid}/{fi + 1:06d}")
    for frame in frames:
        cam = cam_2 if int(frame.split("/")[1]) >= 60 else cam_1
        img = rng.randint(0, 255, (480, 640, 3), np.uint8)
        depth = np.zeros((480, 640), np.uint16)
        label = np.zeros((480, 640), np.uint8)
        poses = np.zeros((3, 4, n_classes), np.float32)
        for ci in range(n_classes):
            center = np.array([(-0.1 + 0.1 * ci), 0.02 * ci, 1.0 + 0.05 * ci])
            _render_sphere(depth, label, cam["cx"], cam["cy"], cam["fx"],
                           cam["fy"], center, 0.04, ci + 1, 10000.0)
            poses[:, :3, ci] = np.eye(3)
            poses[:, 3, ci] = center
        Image.fromarray(img).save(f"{root}/{frame}-color.png")
        Image.fromarray(depth).save(f"{root}/{frame}-depth.png")
        Image.fromarray(label).save(f"{root}/{frame}-label.png")
        sio.savemat(f"{root}/{frame}-meta.mat", {
            "cls_indexes": np.arange(1, n_classes + 1).reshape(-1, 1),
            "poses": poses,
            "factor_depth": np.array([[10000.0]]),
        })

    with open(os.path.join(assets, "train_data_list.txt"), "w") as f:
        f.write("\n".join(frames) + "\n")
    with open(os.path.join(assets, "test_data_list.txt"), "w") as f:
        f.write("\n".join(frames) + "\n")

    # FFB6D-style masks: reuse gt labels; rois rows [_, cls, cmin, rmin, cmax, rmax]
    for fi, frame in enumerate(frames):
        from PIL import Image as I

        label = np.array(I.open(f"{root}/{frame}-label.png"))
        rois = []
        for ci in range(n_classes):
            if ci == 1 and fi == 0:
                continue  # simulate one lost detection in frame 0
            ys, xs = np.nonzero(label == ci + 1)
            rois.append([0, ci + 1, xs.min(), ys.min(), xs.max(), ys.max()])
        sio.savemat(os.path.join(masks_dir, f"{fi:06d}.mat"),
                    {"labels": label, "rois": np.array(rois, np.float32)})
    return root, assets


def make_linemod_fixture(tmpdir: str, seed: int = 0):
    """Miniature LineMOD tree with all 13 object dirs (1 frame each)."""
    from PIL import Image
    import yaml

    rng = np.random.RandomState(seed)
    root = os.path.join(tmpdir, "Linemod_preprocessed")
    models = os.path.join(root, "models")
    os.makedirs(models, exist_ok=True)
    objlist = [1, 2, 4, 5, 6, 8, 9, 10, 11, 12, 13, 14, 15]

    models_info = {}
    for item in objlist:
        # icosahedron-ish mesh in mm
        pts = _sphere_points(60, 40.0, rng)  # mm
        from scipy.spatial import ConvexHull

        faces = ConvexHull(pts).simplices
        cols = rng.randint(0, 255, (60, 3))
        _write_ply_ascii(os.path.join(models, f"obj_{item:02d}.ply"), pts, cols, faces)
        models_info[item] = {"diameter": 80.0}
    with open(os.path.join(models, "models_info.yml"), "w") as f:
        yaml.safe_dump(models_info, f)

    cam = dict(cx=325.26110, cy=242.04899, fx=572.41140, fy=573.57043)
    for item in objlist:
        d = os.path.join(root, "data", f"{item:02d}")
        for sub in ("rgb", "depth", "mask"):
            os.makedirs(os.path.join(d, sub), exist_ok=True)
        img = rng.randint(0, 255, (480, 640, 3), np.uint8)
        depth = np.zeros((480, 640), np.uint16)
        mask = np.zeros((480, 640, 3), np.uint8)
        center = np.array([0.0, 0.0, 900.0])  # mm
        m = _render_sphere(depth, mask[:, :, 0], cam["cx"], cam["cy"],
                           cam["fx"], cam["fy"], center, 40.0, 255, 1.0)
        mask[m] = 255
        ys, xs = np.nonzero(m)
        Image.fromarray(img).save(os.path.join(d, "rgb", "0000.png"))
        Image.fromarray(depth).save(os.path.join(d, "depth", "0000.png"))
        Image.fromarray(mask).save(os.path.join(d, "mask", "0000.png"))
        # SegNet predicted masks for eval mode (reference
        # LM/dataloader_test_LM.py:80): reuse the gt silhouette
        seg_dir = os.path.join(root, "segnet_results", f"{item:02d}_label")
        os.makedirs(seg_dir, exist_ok=True)
        Image.fromarray((m * 255).astype(np.uint8)).save(
            os.path.join(seg_dir, "0000_label.png"))
        gt = {0: [{"obj_id": item,
                   "cam_R_m2c": np.eye(3).flatten().tolist(),
                   "cam_t_m2c": center.tolist(),
                   "obj_bb": [int(xs.min()), int(ys.min()),
                              int(xs.max() - xs.min()), int(ys.max() - ys.min())]}]}
        with open(os.path.join(d, "gt.yml"), "w") as f:
            yaml.safe_dump(gt, f)
        with open(os.path.join(d, "train.txt"), "w") as f:
            f.write("0000\n")
        with open(os.path.join(d, "test.txt"), "w") as f:
            f.write("0000\n" * 10)  # test mode keeps every 10th line
    return root


def make_lmo_fixture(tmpdir: str, lm_root: str, seed: int = 0):
    """Miniature Occlusion-LineMOD tree reusing the LM fixture's models."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    root = os.path.join(tmpdir, "OCCLUSION_LINEMOD")
    masks_root = os.path.join(tmpdir, "LMO_Masks")
    os.makedirs(os.path.join(root, "RGB-D", "rgb_noseg"), exist_ok=True)
    os.makedirs(os.path.join(root, "RGB-D", "depth_noseg"), exist_ok=True)

    cam = dict(cx=325.26110, cy=242.04899, fx=572.41140, fy=573.57043)
    id2name = {1: "ape", 5: "can", 6: "cat", 8: "driller", 9: "duck",
               10: "eggbox", 11: "glue", 12: "holepuncher"}
    img_id = 0
    for item, name in id2name.items():
        os.makedirs(os.path.join(root, "valid_poses", name), exist_ok=True)
        os.makedirs(os.path.join(masks_root, name), exist_ok=True)
        img = rng.randint(0, 255, (480, 640, 3), np.uint8)
        depth = np.zeros((480, 640), np.uint16)
        mask = np.zeros((480, 640), np.uint8)
        center = np.array([0.0, 0.0, 900.0])
        _render_sphere(depth, mask, cam["cx"], cam["cy"], cam["fx"],
                       cam["fy"], center, 40.0, 1, 1.0)
        Image.fromarray(img).save(
            os.path.join(root, "RGB-D", "rgb_noseg", f"color_{img_id:05d}.png"))
        Image.fromarray(depth).save(
            os.path.join(root, "RGB-D", "depth_noseg", f"depth_{img_id:05d}.png"))
        Image.fromarray(mask).save(os.path.join(masks_root, name, "0.png"))
        # pose in the raw LMO frame: the loader applies alignment flipping +
        # R_lo; write a pose whose flipped version is the render pose
        r_raw = np.diag([1.0, -1.0, -1.0])  # flip^-1 @ I
        t_raw = np.array([0.0, -0.0, -0.9])
        with open(os.path.join(root, "valid_poses", name, "0.txt"), "w") as f:
            f.write("rotation:\n")
            for row in r_raw:
                f.write(" ".join(str(v) for v in row) + "\n")
            f.write("center:\n")
            f.write(" ".join(str(v) for v in t_raw) + "\n")
            f.write(f"{img_id}\n")
        img_id += 1
    return root, masks_root
