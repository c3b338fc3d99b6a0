from .dequant_matmul import (
    bfp_matmul,
    bfp_matmul_pallas,
    bfp_matmul_subbyte_pallas,
)
from .packing import (
    PackedBFP,
    PackedBFPSub,
    PackedBFPSubT,
    bfp_decode_lastdim,
    bfp_encode_lastdim,
    effective_block_len,
    pack_block_fp,
    pack_block_fp_subbyte,
    packed_nbytes,
    unpack_block_fp,
    unpack_block_fp_subbyte,
)
