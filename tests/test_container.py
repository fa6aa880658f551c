"""IVC1 container round-trip tests."""

import numpy as np
import pytest

from ivclab_tpu.models import IntraCodec
from ivclab_tpu.runtime.container import IntraPayload
from ivclab_tpu.utils import calc_psnr


def test_container_roundtrip_rgb(lena_small):
    codec = IntraCodec(quantization_scale=0.5)
    codec.train_huffman_from_image(lena_small)
    blob = codec.encode_to_container(lena_small)
    assert isinstance(blob, bytes)
    recon = IntraCodec.decode_from_container(blob)
    # must equal the in-process decode exactly
    ref, _, _ = codec.encode_decode(lena_small)
    assert np.abs(recon.astype(np.float64) - ref.astype(np.float64)).max() < 1e-3


def test_container_roundtrip_gray(lena_small):
    y = lena_small.astype(np.float32).mean(axis=-1)
    codec = IntraCodec(quantization_scale=1.0)
    codec.train_huffman_from_image(y, is_source_rgb=False)
    blob = codec.encode_to_container(y, is_source_rgb=False)
    recon = IntraCodec.decode_from_container(blob)
    assert recon.shape == y.shape
    assert float(calc_psnr(y, recon)) > 28.0


def test_container_parse_fields(lena_small):
    codec = IntraCodec(quantization_scale=0.5)
    codec.train_huffman_from_image(lena_small)
    blob = codec.encode_to_container(lena_small)
    payload = IntraPayload.from_bytes(blob)
    assert payload.shape == lena_small.shape
    assert payload.num_symbols == codec.num_symbols
    assert payload.payload_bits > 0
    assert payload.container_bytes == len(blob)
    # container overhead should be modest vs payload
    assert payload.container_bytes < 2.0 * (payload.payload_bits / 8) + 64_000


def test_container_rejects_garbage():
    with pytest.raises(ValueError):
        IntraPayload.from_bytes(b"NOPE" + b"\0" * 100)


def test_container_odd_shape(rng):
    img = (rng.random((41, 57, 3)) * 255).astype(np.uint8)
    codec = IntraCodec(quantization_scale=0.5)
    codec.train_huffman_from_image(img)
    blob = codec.encode_to_container(img)
    recon = IntraCodec.decode_from_container(blob)
    assert recon.shape == img.shape
    assert float(calc_psnr(img, recon)) > 15.0


def test_large_image_container_roundtrip():
    """Regression: the decoder allocation cap rejected legitimate large
    intra payloads while they serialized at the full 1600-word stride
    (1080p RGB and 2+ Mpix gray could not be decoded). The encoder now
    width-slices its section; large images must round-trip."""
    from ivclab_tpu.models import IntraCodec
    from ivclab_tpu.utils import fixtures
    from ivclab_tpu.utils.metrics import calc_psnr

    base = fixtures.image("lena")
    img = np.tile(base, (3, 4, 1))[:1088, :1920]  # 1080p RGB
    codec = IntraCodec(quantization_scale=2.0)
    codec.train_huffman_from_image(img)
    blob = codec.encode_to_container(img)
    recon = IntraCodec.decode_from_container(blob)
    assert float(calc_psnr(img, recon)) > 25.0

    gray = np.tile(base.mean(axis=-1).astype(np.uint8), (4, 3))[:2048, :1536]
    codec = IntraCodec(quantization_scale=2.0)
    codec.train_huffman_from_image(gray, is_source_rgb=False)
    blob = codec.encode_to_container(gray, is_source_rgb=False)
    recon = IntraCodec.decode_from_container(blob)
    assert float(calc_psnr(gray, recon)) > 25.0
