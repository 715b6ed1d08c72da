"""Live sensors: Realsense + webcam (hardware-gated).

Spec: ``mast3r_slam/dataloader.py:151-229``. Import-guarded so the package
works in headless/datacenter environments.
"""

from __future__ import annotations

import numpy as np

from .datasets import Intrinsics, MonocularDataset


class RealsenseDataset(MonocularDataset):  # pragma: no cover - hardware
    def __init__(self, use_calib: bool = False):
        super().__init__(use_calib)
        import cv2
        import pyrealsense2 as rs

        self._cv2 = cv2
        self.pipeline = rs.pipeline()
        self.h, self.w = 480, 640
        self.rs_config = rs.config()
        self.rs_config.enable_stream(rs.stream.color, self.w, self.h, rs.format.bgr8, 30)
        self.profile = self.pipeline.start(self.rs_config)
        self.rgb_profile = rs.video_stream_profile(self.profile.get_stream(rs.stream.color))
        self.save_results = False
        self.timestamps = []
        if self.use_calibration:
            intr = self.rgb_profile.get_intrinsics()
            self.camera_intrinsics = Intrinsics.from_calib(
                self.img_size, self.w, self.h, [intr.fx, intr.fy, intr.ppx, intr.ppy], True
            )

    def __len__(self):
        return 999999

    def read_img(self, idx):
        frameset = self.pipeline.wait_for_frames()
        self.timestamps.append(frameset.get_timestamp() / 1000)
        rgb = np.asanyarray(frameset.get_color_frame().get_data())
        return self._cv2.cvtColor(rgb, self._cv2.COLOR_BGR2RGB)


class WebcamDataset(MonocularDataset):  # pragma: no cover - hardware
    def __init__(self):
        super().__init__(use_calib=False)
        import cv2

        self._cv2 = cv2
        self.cap = cv2.VideoCapture(-1)
        self.save_results = False
        self.timestamps = []

    def __len__(self):
        return 999999

    def read_img(self, idx):
        ret, img = self.cap.read()
        if not ret:
            raise ValueError("failed to read webcam frame")
        self.timestamps.append(idx / 30)
        return self._cv2.cvtColor(img, self._cv2.COLOR_BGR2RGB)
