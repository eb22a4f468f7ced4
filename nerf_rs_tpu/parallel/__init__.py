from nerf_rs_tpu.parallel.mesh import make_mesh, ray_sharding, replicated_sharding

__all__ = ["make_mesh", "ray_sharding", "replicated_sharding"]
