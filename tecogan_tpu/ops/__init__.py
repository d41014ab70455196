"""Pure-function op library (TPU-first; torch-parity semantics where the
reference's behavior is load-bearing — see SURVEY.md §5.1)."""

from .space import space_to_depth, depth_to_space, space_to_depth_nchw
from .resize import upscale_four, bicubic_four, upscale_two, resize_nhwc, resize_nchw
from .warp import grid_sample, grid_sample_nchw, pseudo_flow_nchw
from .image import (
    preprocess,
    deprocess,
    preprocess_lr,
    deprocess_lr,
    nchw_to_nhwc,
    nhwc_to_nchw,
    save_as_media,
    MediaWriter,
    save_img,
    save_image_grid,
    to_uint8,
)
from .metrics import psnr, psnr_255, ssim, vgg_perceptual_distance
from .extras import (
    pixelshuffle,
    phase_shift,
    random_flip,
    random_flip_batch,
    gaussian_2dkernel,
)

__all__ = [
    "space_to_depth", "depth_to_space", "space_to_depth_nchw",
    "upscale_four", "bicubic_four", "upscale_two", "resize_nhwc", "resize_nchw",
    "grid_sample", "grid_sample_nchw", "pseudo_flow_nchw",
    "preprocess", "deprocess", "preprocess_lr", "deprocess_lr",
    "nchw_to_nhwc", "nhwc_to_nchw",
    "save_as_media", "MediaWriter", "save_img", "save_image_grid", "to_uint8",
    "psnr", "psnr_255", "ssim", "vgg_perceptual_distance",
    "pixelshuffle", "phase_shift", "random_flip", "random_flip_batch",
    "gaussian_2dkernel",
]
