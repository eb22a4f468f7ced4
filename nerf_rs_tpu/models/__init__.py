from nerf_rs_tpu.models.encoding import positional_encoding
from nerf_rs_tpu.models.mlp import nerf_mlp, init_nerf_params
from nerf_rs_tpu.models.hashgrid import (
    hashgrid_mlp,
    init_hashgrid_params,
    sh_encoding,
)

__all__ = ["positional_encoding", "nerf_mlp", "init_nerf_params",
           "hashgrid_mlp", "init_hashgrid_params", "sh_encoding"]
