from .fused_act import fused_leaky_relu
from .transcendental import fast_cos, fast_sin
from .upfirdn2d import upfirdn2d, upsample2d, downsample2d, blur, make_kernel
from .sh_encoder import sh_encode, sh_output_dim
from .hash_encoder import (
    HashGridSpec,
    PackPlan,
    hash_encode,
    hash_encode_packed,
    hash_encode_vjp_sorted,
    init_hash_table,
    hash_table_total_variation,
    pack_hash_table,
    plan_packing,
)

__all__ = [
    "fused_leaky_relu",
    "fast_sin",
    "fast_cos",
    "upfirdn2d",
    "upsample2d",
    "downsample2d",
    "blur",
    "make_kernel",
    "sh_encode",
    "sh_output_dim",
    "HashGridSpec",
    "PackPlan",
    "hash_encode_packed",
    "pack_hash_table",
    "plan_packing",
    "hash_encode",
    "hash_encode_vjp_sorted",
    "init_hash_table",
    "hash_table_total_variation",
]
