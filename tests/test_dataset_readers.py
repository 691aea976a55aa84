"""Dataset-reader tests against synthetic on-disk fixtures.

Builds a minimal DGP-format DDAD scene and a minimal nuScenes table set in
tmp dirs, then drives the real readers end to end (images, calibration,
context frames, lidar -> depth projection, batch-contract assembly).
"""
import json
import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
import PIL.Image as pil  # noqa: E402

from vfdepth_tpu.data.contract import required_keys  # noqa: E402


CAMS = ["camera_01", "camera_05", "camera_06"]
W0, H0 = 64, 48


def _write_img(path, seed):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = (np.random.RandomState(seed).rand(H0, W0, 3) * 255).astype(np.uint8)
    pil.fromarray(arr).save(path)


def _camelize(obj):
    """snake_case keys -> camelCase, recursively (DGP proto-JSON style)."""
    def cam(k):
        parts = k.split("_")
        return parts[0] + "".join(p.capitalize() for p in parts[1:])
    if isinstance(obj, dict):
        return {cam(k): _camelize(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_camelize(v) for v in obj]
    return obj


def _make_ddad(root, camel=False, structured_pc=False, missing_lidar_t=None):
    """Two scenes x 4 samples with 3 cameras + lidar.

    camel: write all proto JSONs with camelCase keys (real DGP exports).
    structured_pc: point clouds as structured-dtype (X, Y, Z, I) arrays.
    missing_lidar_t: drop the lidar datum at this sample index.
    """
    def dump(path, obj):
        with open(path, "w") as f:
            json.dump(_camelize(obj) if camel else obj, f)

    scene_files = []
    for si in range(2):
        sdir = os.path.join(root, f"scene_{si:06d}")
        os.makedirs(os.path.join(sdir, "calibration"), exist_ok=True)
        calib = {
            "names": CAMS + ["LIDAR"],
            "intrinsics": [
                {"fx": 40.0, "fy": 40.0, "cx": W0 / 2, "cy": H0 / 2, "skew": 0.0}
            ] * 3 + [{}],
            "extrinsics": [
                {"translation": {"x": 0.0, "y": 0.0, "z": 1.5},
                 "rotation": {"qw": 0.5, "qx": -0.5, "qy": 0.5, "qz": -0.5}},
            ] * 3 + [{"translation": {"x": 0.0, "y": 0.0, "z": 2.0},
                      "rotation": {"qw": 1.0, "qx": 0.0, "qy": 0.0, "qz": 0.0}}],
        }
        dump(os.path.join(sdir, "calibration", "cal0.json"), calib)

        data, samples = [], []
        for t in range(4):
            keys = []
            for cam in CAMS:
                fn = f"rgb/{cam}/{t:03d}.png"
                _write_img(os.path.join(sdir, fn), seed=si * 100 + t)
                key = f"{cam}_{t}"
                data.append({"key": key,
                             "id": {"name": cam, "timestamp": str(t)},
                             "datum": {"image": {"filename": fn}}})
                keys.append(key)
            if t != missing_lidar_t:
                # lidar: points 5-10 m ahead in lidar frame (x fwd)
                pts = np.zeros((50, 3))
                pts[:, 0] = np.linspace(5, 10, 50)
                pts[:, 1] = np.linspace(-1, 1, 50)
                pcf = f"point_cloud/LIDAR/{t:03d}.npz"
                os.makedirs(os.path.join(sdir, "point_cloud/LIDAR"), exist_ok=True)
                if structured_pc:
                    rec = np.zeros(50, dtype=[("X", "f8"), ("Y", "f8"),
                                              ("Z", "f8"), ("INTENSITY", "f8")])
                    rec["X"], rec["Y"], rec["Z"] = pts[:, 0], pts[:, 1], pts[:, 2]
                    np.savez(os.path.join(sdir, pcf), data=rec)
                else:
                    np.savez(os.path.join(sdir, pcf), data=pts)
                key = f"lidar_{t}"
                data.append({"key": key,
                             "id": {"name": "LIDAR", "timestamp": str(t)},
                             "datum": {"point_cloud": {"filename": pcf}}})
                keys.append(key)
            samples.append({"id": {"index": t}, "datum_keys": keys,
                            "calibration_key": "cal0"})

        scene_json = os.path.join(sdir, "scene.json")
        dump(scene_json, {"samples": samples, "data": data})
        scene_files.append(os.path.relpath(scene_json, root))

    ds_json = os.path.join(root, "ddad.json")
    dump(ds_json, {"scene_splits": {"0": {"filenames": [scene_files[0]]},
                                    "1": {"filenames": [scene_files[1]]}}})
    return ds_json


def test_ddad_reader(tmp_path):
    from vfdepth_tpu.data.ddad import DDADDataset

    ds_json = _make_ddad(str(tmp_path))
    ds = DDADDataset(ds_json, cameras=CAMS, split="train", height=32, width=64,
                     fusion_level=2, with_depth=False)
    # interior samples only: 4 samples -> t in {1, 2} per scene
    assert len(ds) == 2
    sample = ds[0]
    for key in required_keys((0, -1, 1), 2):
        assert key in sample, f"missing {key}"
    assert sample["color/0/0"].shape == (3, 32, 64, 3)
    assert np.isfinite(sample["extrinsics"]).all()
    # camera-to-vehicle extrinsics: camera z (optical axis) maps to vehicle x
    rot = sample["extrinsics"][0, :3, :3]
    np.testing.assert_allclose(rot @ np.array([0, 0, 1.0]), [1, 0, 0], atol=1e-5)


def test_ddad_reader_depth(tmp_path):
    from vfdepth_tpu.data.ddad import DDADDataset

    ds_json = _make_ddad(str(tmp_path))
    ds = DDADDataset(ds_json, cameras=CAMS, split="val", height=32, width=64,
                     fusion_level=2, with_depth=True, cache_depth=False)
    sample = ds[0]
    depth = sample["depth"]
    assert depth.shape == (3, 32, 64, 1)
    # the forward camera must see some lidar returns at 5-10 m
    vals = depth[depth > 0]
    assert vals.size > 0
    assert vals.min() > 2.0 and vals.max() < 15.0


def _make_nuscenes(root, no_prev_t=None):
    """no_prev_t: strip the prev sweep link from sample t's camera keyframes
    (first-in-scene keyframes in real nuScenes have prev='')."""
    version = "v1.0-trainval"
    vdir = os.path.join(root, version)
    os.makedirs(vdir, exist_ok=True)
    cams = ["CAM_FRONT", "CAM_FRONT_LEFT"]
    sensors = ([{"token": f"s_{c}", "channel": c, "modality": "camera"} for c in cams]
               + [{"token": "s_LIDAR_TOP", "channel": "LIDAR_TOP",
                   "modality": "lidar"}])
    calibrated = []
    for c in cams:
        calibrated.append({
            "token": f"cs_{c}", "sensor_token": f"s_{c}",
            "translation": [1.5, 0.0, 1.6],
            "rotation": [0.5, -0.5, 0.5, -0.5],  # cam z -> ego x
            "camera_intrinsic": [[40.0, 0, W0 / 2], [0, 40.0, H0 / 2], [0, 0, 1]],
        })
    calibrated.append({"token": "cs_LIDAR_TOP", "sensor_token": "s_LIDAR_TOP",
                       "translation": [1.0, 0.0, 1.9],
                       "rotation": [1.0, 0.0, 0.0, 0.0]})

    ego_poses = [{"token": f"ep_{t}", "translation": [float(t), 0.0, 0.0],
                  "rotation": [1.0, 0.0, 0.0, 0.0]} for t in range(6)]

    samples, sample_data = [], []
    for t in range(3):
        tok = f"sample_{t}"
        samples.append({"token": tok})
        for c in cams:
            for j, (sweep, kf) in enumerate([(3 * t, False), (3 * t + 1, True),
                                             (3 * t + 2, False)]):
                sd_tok = f"sd_{c}_{t}_{j}"
                fn = f"samples/{c}/{t}_{j}.jpg"
                _write_img(os.path.join(root, fn), seed=t * 10 + j)
                sample_data.append({
                    "token": sd_tok, "sample_token": tok,
                    "calibrated_sensor_token": f"cs_{c}",
                    "ego_pose_token": f"ep_{min(sweep // 2, 5)}",
                    "filename": fn, "is_key_frame": kf,
                    "height": H0, "width": W0,
                    "prev": (f"sd_{c}_{t}_{j - 1}"
                             if j > 0 and not (t == no_prev_t and j == 1)
                             else ""),
                    "next": f"sd_{c}_{t}_{j + 1}" if j < 2 else "",
                })
        # lidar keyframe
        pts = np.zeros((40, 5), np.float32)
        pts[:, 0] = np.linspace(5, 12, 40)
        fn = f"samples/LIDAR_TOP/{t}.pcd.bin"
        os.makedirs(os.path.join(root, "samples/LIDAR_TOP"), exist_ok=True)
        pts.tofile(os.path.join(root, fn))
        sample_data.append({
            "token": f"sd_lidar_{t}", "sample_token": tok,
            "calibrated_sensor_token": "cs_LIDAR_TOP",
            "ego_pose_token": f"ep_{min(3 * t // 2, 5)}",
            "filename": fn, "is_key_frame": True,
            "prev": "", "next": "",
        })

    for name, table in [("sensor", sensors), ("calibrated_sensor", calibrated),
                        ("ego_pose", ego_poses), ("sample", samples),
                        ("sample_data", sample_data)]:
        with open(os.path.join(vdir, f"{name}.json"), "w") as f:
            json.dump(table, f)
    return root, cams


def test_nuscenes_reader(tmp_path):
    from vfdepth_tpu.data.nuscenes import NuScenesDataset

    root, cams = _make_nuscenes(str(tmp_path))
    ds = NuScenesDataset(root, cameras=cams, split="train", height=32, width=64,
                         fusion_level=2, with_depth=False)
    assert len(ds) == 3
    sample = ds[0]
    for key in required_keys((0, -1, 1), 2):
        assert key in sample, f"missing {key}"
    assert sample["color/0/0"].shape == (2, 32, 64, 3)
    # context frames come from the prev/next sweeps -> different pixels
    assert not np.array_equal(sample["color/0/0"], sample["color/-1/0"])


def test_nuscenes_reader_depth(tmp_path):
    from vfdepth_tpu.data.nuscenes import NuScenesDataset

    root, cams = _make_nuscenes(str(tmp_path))
    ds = NuScenesDataset(root, cameras=cams, split="val", height=32, width=64,
                         fusion_level=2, with_depth=True, cache_depth=False)
    sample = ds[0]
    depth = sample["depth"]
    assert depth.shape == (2, 32, 64, 1)
    vals = depth[depth > 0]
    assert vals.size > 0 and vals.max() < 20.0


def test_ddad_reader_camelcase_protos(tmp_path):
    """Real DGP exports use camelCase proto-JSON keys; the reader must parse
    either style identically (vfdepth_tpu/data/ddad.py::_g)."""
    from vfdepth_tpu.data.ddad import DDADDataset

    snake_root = os.path.join(str(tmp_path), "snake")
    camel_root = os.path.join(str(tmp_path), "camel")
    os.makedirs(snake_root)
    os.makedirs(camel_root)
    ds_s = DDADDataset(_make_ddad(snake_root), cameras=CAMS, split="train",
                       height=32, width=64, fusion_level=2)
    ds_c = DDADDataset(_make_ddad(camel_root, camel=True), cameras=CAMS,
                       split="train", height=32, width=64, fusion_level=2)
    assert len(ds_c) == len(ds_s) == 2
    a, b = ds_s[0], ds_c[0]
    assert set(a) == set(b)
    np.testing.assert_allclose(a["color/0/0"], b["color/0/0"])
    np.testing.assert_allclose(a["extrinsics"], b["extrinsics"])
    np.testing.assert_allclose(a["K/0"], b["K/0"])


def test_ddad_reader_structured_pointcloud_and_missing_lidar(tmp_path):
    """Structured-dtype DGP point clouds parse, and a frame without a lidar
    sweep yields an all-zero depth map instead of crashing or dropping the
    'depth' key (batch contract must stay uniform)."""
    from vfdepth_tpu.data.ddad import DDADDataset

    ds_json = _make_ddad(str(tmp_path), structured_pc=True, missing_lidar_t=2)
    ds = DDADDataset(ds_json, cameras=CAMS, split="val", height=32, width=64,
                     fusion_level=2, with_depth=True, cache_depth=False)
    assert len(ds) == 2  # t in {1, 2}
    with_lidar = ds[0]["depth"]      # t=1: has lidar (structured npz)
    without = ds[1]["depth"]         # t=2: lidar datum absent
    assert with_lidar.shape == without.shape == (3, 32, 64, 1)
    assert (with_lidar > 0).sum() > 0
    assert (without == 0).all()


def test_nuscenes_val_sample_without_prev(tmp_path):
    """First-in-scene keyframes have prev=''. Train filters them out;
    val keeps them and the missing context reuses the current frame
    (reference nuscenes_dataset.py:90-101)."""
    from vfdepth_tpu.data.nuscenes import NuScenesDataset

    root, cams = _make_nuscenes(str(tmp_path), no_prev_t=0)
    train = NuScenesDataset(root, cameras=cams, split="train",
                            height=32, width=64, fusion_level=2)
    assert len(train) == 2  # sample_0 dropped
    val = NuScenesDataset(root, cameras=cams, split="val",
                          height=32, width=64, fusion_level=2)
    assert len(val) == 3
    s0 = val[0]
    # missing prev -> the -1 context frame is the current frame
    np.testing.assert_allclose(s0["color/-1/0"], s0["color/0/0"])
