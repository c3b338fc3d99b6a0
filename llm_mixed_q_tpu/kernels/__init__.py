from .dequant_matmul import bfp_matmul, bfp_matmul_pallas
from .packing import (
    PackedBFP,
    effective_block_len,
    pack_block_fp,
    packed_nbytes,
    unpack_block_fp,
)
