"""Dataset ingestion: TUM / EuRoC / ETH3D / 7-Scenes / MP4 / image folders.

Behavioral spec: ``mast3r_slam/dataloader.py`` — per-dataset file layouts,
hard-coded calibrations (TUM fr1/2/3, dataloader.py:76-88; 7-Scenes :145),
EuRoC always-undistort policy (:92-116), the ``Intrinsics`` rescale to the
512-long-edge crop (:277-317), and the path-keyword dispatch (:320-338).

Differences from the reference: no torch Dataset base (plain Python
iterables), torchcodec replaced by cv2 for MP4, natsort replaced by a local
natural-sort key (natsort is not in the base image), realsense/webcam gated
on their imports.
"""

from __future__ import annotations

import pathlib
import re
from typing import List, Optional, Sequence

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from .image import resize_img


def natsorted(paths: Sequence) -> List:
    """Natural sort (numeric-aware), replacing the natsort dependency."""

    def key(p):
        s = str(p)
        return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]

    return sorted(paths, key=key)


class Intrinsics:
    """Camera intrinsics + undistortion remap + K rescaled to the network
    crop (dataloader.py:277-317)."""

    def __init__(self, img_size, W, H, K_orig, K, distortion, mapx, mapy):
        self.img_size = img_size
        self.W, self.H = W, H
        self.K_orig = K_orig
        self.K = K
        self.distortion = distortion
        self.mapx = mapx
        self.mapy = mapy
        _, (scale_w, scale_h, half_crop_w, half_crop_h) = resize_img(
            np.zeros((H, W, 3)), self.img_size, return_transformation=True
        )
        self.K_frame = self.K.copy()
        self.K_frame[0, 0] = self.K[0, 0] / scale_w
        self.K_frame[1, 1] = self.K[1, 1] / scale_h
        self.K_frame[0, 2] = self.K[0, 2] / scale_w - half_crop_w
        self.K_frame[1, 2] = self.K[1, 2] / scale_h - half_crop_h

    def remap(self, img: np.ndarray) -> np.ndarray:
        return cv2.remap(img, self.mapx, self.mapy, cv2.INTER_LINEAR)

    @staticmethod
    def from_calib(img_size, W, H, calib, use_calib: bool, center_principal_point: bool = True,
                   always_undistort: bool = False) -> Optional["Intrinsics"]:
        if not use_calib and not always_undistort:
            return None
        fx, fy, cx, cy = calib[:4]
        distortion = np.zeros(4)
        if len(calib) > 4:
            distortion = np.array(calib[4:])
        K = np.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])
        K_opt, _ = cv2.getOptimalNewCameraMatrix(
            K, distortion, (W, H), 0, (W, H), centerPrincipalPoint=center_principal_point
        )
        mapx, mapy = cv2.initUndistortRectifyMap(K, distortion, None, K_opt, (W, H), cv2.CV_32FC1)
        return Intrinsics(img_size, W, H, K, K_opt, distortion, mapx, mapy)


class MonocularDataset:
    """Iterable of (timestamp, rgb float image in [0,1]) (dataloader.py:20-64)."""

    def __init__(self, use_calib: bool = False, center_principal_point: bool = True):
        self.dtype = np.float32
        self.rgb_files: List = []
        self.timestamps: List = []
        self.img_size = 512
        self.camera_intrinsics: Optional[Intrinsics] = None
        self.use_calibration = use_calib
        self.center_principal_point = center_principal_point
        self.save_results = True

    def __len__(self):
        return len(self.rgb_files)

    def __getitem__(self, idx):
        img = self.get_image(idx)
        return self.get_timestamp(idx), img

    def get_timestamp(self, idx):
        return self.timestamps[idx]

    def read_img(self, idx):
        img = cv2.imread(str(self.rgb_files[idx]))
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def get_image(self, idx):
        img = self.read_img(idx)
        if self.use_calibration and self.camera_intrinsics is not None:
            img = self.camera_intrinsics.remap(img)
        return img.astype(self.dtype) / 255.0

    def get_img_shape(self):
        img = self.read_img(0)
        raw_shape = img.shape
        out = resize_img(img.astype(self.dtype) / 255.0, self.img_size)
        return tuple(out["img"][0].shape[:2]), raw_shape[:2]

    def subsample(self, subsample: int):
        self.rgb_files = self.rgb_files[::subsample]
        self.timestamps = self.timestamps[::subsample]

    def has_calib(self):
        return self.camera_intrinsics is not None


class TUMDataset(MonocularDataset):
    """TUM-RGBD: rgb.txt listing + per-freiburg calibration
    (dataloader.py:67-90)."""

    def __init__(self, dataset_path, use_calib=False, center_principal_point=True):
        super().__init__(use_calib, center_principal_point)
        self.dataset_path = pathlib.Path(dataset_path)
        tstamp_rgb = np.loadtxt(self.dataset_path / "rgb.txt", delimiter=" ", dtype=str)
        self.rgb_files = [self.dataset_path / f for f in tstamp_rgb[:, 1]]
        self.timestamps = list(tstamp_rgb[:, 0])

        match = re.search(r"freiburg(\d+)", str(dataset_path))
        idx = int(match.group(1)) if match else 1
        calib = {
            1: [517.3, 516.5, 318.6, 255.3, 0.2624, -0.9531, -0.0054, 0.0026, 1.1633],
            2: [520.9, 521.0, 325.1, 249.7, 0.2312, -0.7849, -0.0033, -0.0001, 0.9172],
            3: [535.4, 539.2, 320.1, 247.6],
        }[idx]
        self.camera_intrinsics = Intrinsics.from_calib(
            self.img_size, 640, 480, np.array(calib), use_calib, center_principal_point
        )


class EurocDataset(MonocularDataset):
    """EuRoC MAV cam0; always undistorts (dataloader.py:92-116)."""

    def __init__(self, dataset_path, use_calib=False, center_principal_point=True):
        super().__init__(use_calib, center_principal_point)
        import yaml

        self.use_calibration = True
        self.dataset_path = pathlib.Path(dataset_path)
        tstamp_rgb = np.loadtxt(
            self.dataset_path / "mav0/cam0/data.csv", delimiter=",", dtype=str
        )
        self.rgb_files = [self.dataset_path / "mav0/cam0/data" / f for f in tstamp_rgb[:, 1]]
        self.timestamps = list(tstamp_rgb[:, 0])
        with open(self.dataset_path / "mav0/cam0/sensor.yaml") as f:
            cam0 = yaml.safe_load(f)
        W, H = cam0["resolution"]
        calib = [*cam0["intrinsics"], *cam0["distortion_coefficients"]]
        self.camera_intrinsics = Intrinsics.from_calib(
            self.img_size, W, H, np.array(calib), use_calib, center_principal_point,
            always_undistort=True,
        )

    def read_img(self, idx):
        img = cv2.imread(str(self.rgb_files[idx]), cv2.IMREAD_GRAYSCALE)
        return cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)


class ETH3DDataset(MonocularDataset):
    """ETH3D SLAM: rgb.txt + calibration.txt (dataloader.py:119-135)."""

    def __init__(self, dataset_path, use_calib=False, center_principal_point=True):
        super().__init__(use_calib, center_principal_point)
        self.dataset_path = pathlib.Path(dataset_path)
        tstamp_rgb = np.loadtxt(self.dataset_path / "rgb.txt", delimiter=" ", dtype=str)
        self.rgb_files = [self.dataset_path / f for f in tstamp_rgb[:, 1]]
        self.timestamps = list(tstamp_rgb[:, 0])
        calibration = np.loadtxt(self.dataset_path / "calibration.txt", dtype=np.float32)
        _, (H, W) = self.get_img_shape()
        self.camera_intrinsics = Intrinsics.from_calib(
            self.img_size, W, H, calibration, use_calib, center_principal_point
        )


class SevenScenesDataset(MonocularDataset):
    """7-Scenes seq-01 color frames, fixed calibration (dataloader.py:137-148)."""

    def __init__(self, dataset_path, use_calib=False, center_principal_point=True):
        super().__init__(use_calib, center_principal_point)
        self.dataset_path = pathlib.Path(dataset_path)
        self.rgb_files = natsorted((self.dataset_path / "seq-01").glob("*.color.png"))
        self.timestamps = list(np.arange(len(self.rgb_files), dtype=self.dtype))
        self.camera_intrinsics = Intrinsics.from_calib(
            self.img_size, 640, 480, [585.0, 585.0, 320.0, 240.0], use_calib,
            center_principal_point,
        )


class MP4Dataset(MonocularDataset):
    """Video file via cv2 (the reference prefers torchcodec when installed,
    dataloader.py:231-265)."""

    def __init__(self, dataset_path, subsample: int = 1, **kw):
        super().__init__(use_calib=False)
        self.dataset_path = pathlib.Path(dataset_path)
        self.cap = cv2.VideoCapture(str(self.dataset_path))
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.total_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.stride = max(1, subsample)
        self.timestamps = []

    def __len__(self):
        return self.total_frames // self.stride

    def get_timestamp(self, idx):
        return idx * self.stride / self.fps

    def read_img(self, idx):
        self.cap.set(cv2.CAP_PROP_POS_FRAMES, idx * self.stride)
        ret, img = self.cap.read()
        if not ret:
            raise ValueError("failed to read frame")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class RGBFiles(MonocularDataset):
    """Folder of jpgs at 30 fps (dataloader.py:268-274)."""

    def __init__(self, dataset_path, **kw):
        super().__init__(use_calib=False)
        self.dataset_path = pathlib.Path(dataset_path)
        files = []
        for pat in ("*.jpg", "*.jpeg", "*.png"):  # reference globs jpg only
            files += self.dataset_path.glob(pat)
        self.rgb_files = natsorted(files)
        self.timestamps = list(np.arange(len(self.rgb_files), dtype=self.dtype) / 30.0)


def load_dataset(dataset_path: str, use_calib: bool = False,
                 center_principal_point: bool = True, subsample: int = 1):
    """Path-keyword dispatch (dataloader.py:320-338)."""
    parts = str(dataset_path).split("/")
    kw = dict(use_calib=use_calib, center_principal_point=center_principal_point)
    if "tum" in parts:
        ds = TUMDataset(dataset_path, **kw)
    elif "euroc" in parts:
        ds = EurocDataset(dataset_path, **kw)
    elif "eth3d" in parts:
        ds = ETH3DDataset(dataset_path, **kw)
    elif "7-scenes" in parts:
        ds = SevenScenesDataset(dataset_path, **kw)
    elif "realsense" in parts:  # pragma: no cover - hardware
        from .live import RealsenseDataset

        ds = RealsenseDataset(use_calib=use_calib)
    elif "webcam" in parts:  # pragma: no cover - hardware
        from .live import WebcamDataset

        ds = WebcamDataset()
    else:
        ext = parts[-1].split(".")[-1].lower()
        if ext in ("mp4", "avi", "mov"):
            ds = MP4Dataset(dataset_path, subsample=subsample)
        else:
            ds = RGBFiles(dataset_path)
    if subsample > 1 and not isinstance(ds, MP4Dataset):
        ds.subsample(subsample)
    return ds
