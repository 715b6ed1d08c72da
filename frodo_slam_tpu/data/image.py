"""Image preprocessing: the reference's exact resize/crop/normalize recipe.

Spec: ``mast3r_slam/mast3r_utils.py:369-460`` (``_resize_pil_image`` /
``resize_img``) and ImgNorm = Normalize(mean=0.5, std=0.5)
(``dust3r/utils/image.py:23``). Keeping this bit-close matters: the pointmap
network was trained on LANCZOS/BICUBIC-resized, center-cropped inputs.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import PIL.Image


class ImgNormStats(NamedTuple):
    mean: float = 0.5
    std: float = 0.5


def _resize_pil_image(img: PIL.Image.Image, long_edge_size: int) -> PIL.Image.Image:
    S = max(img.size)
    interp = PIL.Image.LANCZOS if S > long_edge_size else PIL.Image.BICUBIC
    new_size = tuple(int(round(x * long_edge_size / S)) for x in img.size)
    return img.resize(new_size, interp)


def resize_img(img: np.ndarray, size: int = 512, square_ok: bool = False,
               return_transformation: bool = False):
    """Resize long edge to ``size``, center-crop to multiples of 16, ImgNorm.

    ``img``: float array (H, W, 3) in [0, 1]. Returns dict with
    - ``img``: (1, H', W', 3) float32 normalized (channel-last, TPU layout)
    - ``true_shape``: (1, 2) int32 [H', W']
    - ``unnormalized_img``: (H', W', 3) uint8
    and optionally the (scale_w, scale_h, half_crop_w, half_crop_h) transform
    used by Intrinsics rescaling (mast3r_utils.py:448-455).
    """
    # 224 keeps the reference's square-crop special case; any other size
    # follows the 512-long-edge path (sizes below 512 are used by tests)
    assert size == 224 or size % 16 == 0, size
    pil = PIL.Image.fromarray(np.uint8(img * 255))
    W1, H1 = pil.size
    if size == 224:
        pil = _resize_pil_image(pil, round(size * max(W1 / H1, H1 / W1)))
    else:
        pil = _resize_pil_image(pil, size)
    W, H = pil.size
    cx, cy = W // 2, H // 2
    if size == 224:
        half = min(cx, cy)
        pil = pil.crop((cx - half, cy - half, cx + half, cy + half))
    else:
        halfw, halfh = ((2 * cx) // 16) * 8, ((2 * cy) // 16) * 8
        if not square_ok and W == H:
            halfh = int(3 * halfw / 4)
        pil = pil.crop((cx - halfw, cy - halfh, cx + halfw, cy + halfh))

    arr = np.asarray(pil)
    normed = (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
    res = dict(
        img=normed[None],  # (1, H', W', 3)
        true_shape=np.int32([pil.size[::-1]]),
        unnormalized_img=arr,
    )
    if return_transformation:
        scale_w = W1 / W
        scale_h = H1 / H
        half_crop_w = (W - pil.size[0]) / 2
        half_crop_h = (H - pil.size[1]) / 2
        return res, (scale_w, scale_h, half_crop_w, half_crop_h)
    return res
