from nerf_rs_tpu.ops.rays import Camera, camera_rays, ray_directions
from nerf_rs_tpu.ops.sampling import stratified_samples, importance_samples, merge_samples
from nerf_rs_tpu.ops.volume import compute_weights, composite, integrate

__all__ = [
    "Camera",
    "camera_rays",
    "ray_directions",
    "stratified_samples",
    "importance_samples",
    "merge_samples",
    "compute_weights",
    "composite",
    "integrate",
]
