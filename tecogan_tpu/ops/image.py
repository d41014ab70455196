"""Range-mapping and image I/O helpers (reference code/ops.py:24-41,232-242)."""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp


def preprocess(image):
    """[0,1] -> [-1,1] (reference ops.py:24-26)."""
    return image * 2.0 - 1.0


def deprocess(image):
    """[-1,1] -> [0,1] (reference ops.py:29-31)."""
    return (image + 1.0) / 2.0


def preprocess_lr(image):
    """Identity, kept for call-site parity (reference ops.py:34-36)."""
    return image


def deprocess_lr(image):
    """Identity (reference ops.py:39-41)."""
    return image


def transfer_quantize_u8(x: np.ndarray) -> np.ndarray:
    """HOST half of the --transfer_dtype u8 round trip: float [0,1] ->
    uint8 via np.rint.  MUST stay paired with transfer_dequantize_f32 —
    the rint-multiply here and the reciprocal multiply there are the
    bit-parity contract for host-vs-device results (engine/train.py)."""
    return np.rint(np.asarray(x) * 255.0).astype(np.uint8)


def transfer_dequantize_f32(x):
    """DEVICE half of the u8 transfer round trip: uint8 -> float [0,1]
    as ``x * f32(1/255)`` (NOT x / 255 — XLA lowers the division to a
    reciprocal multiply anyway; defining it as the multiply makes host
    and device results bit-identical)."""
    return x.astype(jnp.float32) * jnp.float32(1.0 / 255.0)


def to_uint8(frames: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint8 with the reference's scale-then-truncate
    (save_as_gif, ops.py:234-237 does `*255` then astype).  uint8 input
    passes through unchanged (already-converted device output,
    transfer_to_uint8)."""
    arr = np.asarray(frames)
    if arr.dtype == np.uint8:
        return arr
    arr = arr.astype(np.float32) * 255.0
    return np.clip(arr, 0, 255).astype(np.uint8)


def transfer_to_uint8(x):
    """DEVICE half of to_uint8: ``clip(x * 255, 0, 255).astype(u8)`` in
    f32 on device — bit-identical to fetching f32 and calling to_uint8 on
    host (same IEEE multiply, same truncating float->int convert), at 4x
    fewer device->host bytes.  Used by the chunked inference sink path."""
    x = x.astype(jnp.float32) * jnp.float32(255.0)
    return jnp.clip(x, 0.0, 255.0).astype(jnp.uint8)


def save_as_media(frames_thwc: np.ndarray, filepath: str, fps: int = 24) -> None:
    """Save a (T, H, W, C) float [0,1] clip as gif (imageio) or video
    (cv2.VideoWriter — this image's imageio has no ffmpeg backend).
    Covers the reference's save_as_gif role (ops.py:234-237) for both the
    gif artifacts and the --videotype mp4 output (main.py:49,220)."""
    images = to_uint8(frames_thwc)
    os.makedirs(os.path.dirname(os.path.abspath(filepath)), exist_ok=True)
    ext = os.path.splitext(filepath)[1].lower()
    if ext in (".mp4", ".avi", ".mov", ".webm", ".mkv"):
        import cv2

        fourcc = {
            ".mp4": "mp4v", ".mov": "mp4v", ".avi": "XVID",
            ".webm": "VP80", ".mkv": "X264",
        }[ext]
        h, w = images.shape[1:3]
        writer = cv2.VideoWriter(
            filepath, cv2.VideoWriter_fourcc(*fourcc), fps, (w, h)
        )
        if not writer.isOpened():
            raise IOError(f"cv2.VideoWriter could not open {filepath}")
        for frame in images:
            writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        writer.release()
    else:
        import imageio

        imageio.mimsave(filepath, images)


class MediaWriter:
    """Incremental clip writer: append (T, H, W, C) float [0,1] windows,
    frames are encoded as they arrive (host memory O(window) for video
    containers).  Pairs with engine.inference.build_chunked_inference so
    a 1000-frame 1080p clip never exists whole on device OR host.

    gif has no streaming encoder in this image's imageio — frames are
    buffered and written on close (use a video container for long clips).
    """

    def __init__(self, filepath: str, fps: int = 24):
        self.filepath = filepath
        self.fps = fps
        self._writer = None
        self._gif_frames = None
        os.makedirs(os.path.dirname(os.path.abspath(filepath)), exist_ok=True)
        ext = os.path.splitext(filepath)[1].lower()
        self._video = ext in (".mp4", ".avi", ".mov", ".webm", ".mkv")
        self._fourcc = {
            ".mp4": "mp4v", ".mov": "mp4v", ".avi": "XVID",
            ".webm": "VP80", ".mkv": "X264",
        }.get(ext)
        if not self._video:
            self._gif_frames = []

    def append(self, frames_thwc: np.ndarray) -> None:
        images = to_uint8(frames_thwc)
        if not self._video:
            self._gif_frames.extend(list(images))
            return
        import cv2

        if self._writer is None:
            h, w = images.shape[1:3]
            self._writer = cv2.VideoWriter(
                self.filepath, cv2.VideoWriter_fourcc(*self._fourcc),
                self.fps, (w, h),
            )
            if not self._writer.isOpened():
                raise IOError(f"cv2.VideoWriter could not open {self.filepath}")
        for frame in images:
            self._writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))

    def close(self) -> None:
        if self._writer is not None:
            self._writer.release()
            self._writer = None
        elif self._gif_frames is not None:
            import imageio

            imageio.mimsave(self.filepath, self._gif_frames)
            self._gif_frames = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def save_img(out_path: str, img_hwc: np.ndarray) -> None:
    """Save one float [0,1] HWC image (reference save_img, ops.py:240-242)."""
    import imageio

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    imageio.imwrite(out_path, to_uint8(img_hwc))


def save_image_grid(images_nhwc: np.ndarray, fp: str, ncols: int = 8) -> None:
    """Tiled image grid like torchvision.utils.save_image (main.py:288-294)."""
    n, h, w, c = images_nhwc.shape
    ncols = min(ncols, n)
    nrows = (n + ncols - 1) // ncols
    grid = np.zeros((nrows * h, ncols * w, c), dtype=np.float32)
    for i in range(n):
        r, col = divmod(i, ncols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images_nhwc[i]
    save_img(fp, grid)


def nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))
