from nerf_rs_tpu.io.weights import (
    load_nerf_params,
    save_nerf_params,
    find_lego_assets,
    LAYER_NAMES,
)
from nerf_rs_tpu.io.golden import load_golden, camera_from_golden
from nerf_rs_tpu.io.image import save_ppm, save_png, pixels_to_rgba, quantize_u8

__all__ = [
    "load_nerf_params",
    "save_nerf_params",
    "find_lego_assets",
    "LAYER_NAMES",
    "load_golden",
    "camera_from_golden",
    "save_ppm",
    "save_png",
    "pixels_to_rgba",
    "quantize_u8",
]
