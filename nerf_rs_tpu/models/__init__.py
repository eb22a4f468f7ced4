from nerf_rs_tpu.models.encoding import positional_encoding
from nerf_rs_tpu.models.mlp import nerf_mlp, init_nerf_params

__all__ = ["positional_encoding", "nerf_mlp", "init_nerf_params"]
