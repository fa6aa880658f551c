from ivclab_tpu.ops.color import rgb2gray, rgb2ycbcr, rgb2ycbcr_ict, ycbcr2rgb, ycbcr2rgb_ict
from ivclab_tpu.ops.dct import (
    DiscreteCosineTransform,
    dct_matrix,
    dct2,
    idct2,
    dct2_fused,
    idct2_fused,
    zigzag_scan,
)
from ivclab_tpu.ops.quant import (
    PatchQuant,
    quant_tables,
    quant_table_zigzag,
    quantize_flat,
    dequantize_flat,
)
from ivclab_tpu.ops.resample import (
    downsample,
    upsample,
    interpolation_upsample,
    lowpass_filter,
    decimate,
    fft_resample,
    resample,
    FilterPipeline,
)
from ivclab_tpu.ops.zerorun import (
    ZeroRunCoder,
    zerorun_encode_blocks,
    zerorun_decode_stream,
    compact_symbols,
)

__all__ = [
    "rgb2gray", "rgb2ycbcr", "rgb2ycbcr_ict", "ycbcr2rgb", "ycbcr2rgb_ict",
    "DiscreteCosineTransform", "dct_matrix", "dct2", "idct2",
    "dct2_fused", "idct2_fused", "zigzag_scan",
    "PatchQuant", "quant_tables", "quant_table_zigzag",
    "quantize_flat", "dequantize_flat",
    "downsample", "upsample", "interpolation_upsample", "lowpass_filter",
    "decimate", "fft_resample", "resample", "FilterPipeline",
    "ZeroRunCoder", "zerorun_encode_blocks", "zerorun_decode_stream",
    "compact_symbols",
]
