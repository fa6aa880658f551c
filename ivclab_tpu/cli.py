"""Command-line interface.

The reference's de-facto CLI is "run an exercise script"
(``README.md:26-30``); here the same workloads are first-class commands:

  python -m ivclab_tpu.cli encode-image  fixture:lena out.ivc --q 0.15
  python -m ivclab_tpu.cli decode-image  out.ivc recon.png
  python -m ivclab_tpu.cli roundtrip-image fixture:lena --q 0.15
  python -m ivclab_tpu.cli rd-sweep --kind image|video|dpcm
  python -m ivclab_tpu.cli encode-video  fixture:foreman --q 1.0 --frames 8
  python -m ivclab_tpu.cli info out.ivc

Images may be files (anything PIL reads) or ``fixture:<name>`` synthetic
fixtures; video sources are ``fixture:<name>`` or a directory of frames.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _load_image(spec: str) -> np.ndarray:
    if spec.startswith("fixture:"):
        from ivclab_tpu.utils import fixtures

        return fixtures.image(spec.split(":", 1)[1])
    from ivclab_tpu.utils.io import imread

    return imread(spec)


def _load_video(spec: str, frames: int) -> np.ndarray:
    if spec.startswith("fixture:"):
        from ivclab_tpu.utils import fixtures

        return fixtures.video(spec.split(":", 1)[1], num_frames=frames)
    from ivclab_tpu.utils.io import imread

    paths = sorted(Path(spec).glob("*"))[:frames]
    return np.stack([imread(str(p)) for p in paths])


def cmd_encode_image(args):
    from ivclab_tpu.models import IntraCodec

    img = _load_image(args.input)
    train = _load_image(args.train) if args.train else img
    codec = IntraCodec(quantization_scale=args.q)
    codec.train_huffman_from_image(train)
    blob = codec.encode_to_container(img)
    Path(args.output).write_bytes(blob)
    H, W = img.shape[:2]
    print(
        json.dumps(
            {
                "container_bytes": len(blob),
                "payload_bpp": round(codec.num_symbols and _payload_bits(blob) / (H * W), 4),
            }
        )
    )


def _payload_bits(blob: bytes) -> int:
    from ivclab_tpu.runtime.container import IntraPayload

    return IntraPayload.from_bytes(blob).payload_bits


def cmd_decode_image(args):
    from ivclab_tpu.models import IntraCodec
    from ivclab_tpu.utils.io import imwrite

    recon = IntraCodec.decode_from_container(Path(args.input).read_bytes())
    imwrite(args.output, recon)
    print(json.dumps({"shape": list(np.asarray(recon).shape)}))


def cmd_roundtrip_image(args):
    from ivclab_tpu.models import IntraCodec
    from ivclab_tpu.utils import calc_psnr

    img = _load_image(args.input)
    train = _load_image(args.train) if args.train else img
    codec = IntraCodec(quantization_scale=args.q)
    codec.train_huffman_from_image(train)
    recon, _, _, bpp = codec.encode_decode(img, return_bpp=True)
    print(json.dumps({"psnr_db": round(float(calc_psnr(img, recon)), 3), "bpp": round(bpp, 4)}))


def cmd_encode_video(args):
    from ivclab_tpu.models import VideoCodec
    from ivclab_tpu.utils import calc_psnr

    frames = _load_video(args.input, args.frames)
    codec = VideoCodec(
        quantization_scale=args.q,
        search_range=args.search_range,
        codebook_policy=args.codebook_policy,
    )
    recons, bits = codec.encode_decode_sequence(frames, gop_size=args.gop)
    psnrs = [float(calc_psnr(frames[t], recons[t])) for t in range(frames.shape[0])]
    bpps = bits / (frames[0].size / 3)
    print(
        json.dumps(
            {
                "frames": int(frames.shape[0]),
                "mean_psnr_db": round(float(np.mean(psnrs)), 3),
                "mean_bpp": round(float(np.mean(bpps)), 4),
                "per_frame_bits": [int(b) for b in bits],
            }
        )
    )


def cmd_rd_sweep(args):
    from ivclab_tpu.config import SweepConfig
    from ivclab_tpu.utils import calc_psnr, fixtures

    sweep = SweepConfig()
    points = []
    if args.kind == "image":
        from ivclab_tpu.models import IntraCodec

        train = fixtures.image("lena_small")
        img = fixtures.image("lena")
        for q in sweep.image_q_scales:
            codec = IntraCodec(quantization_scale=q)
            codec.train_huffman_from_image(train)
            recon, _, _, bpp = codec.encode_decode(img, return_bpp=True)
            points.append({"q": q, "bpp": round(bpp, 4), "psnr_db": round(float(calc_psnr(img, recon)), 3)})
    elif args.kind == "video":
        from ivclab_tpu.models import VideoCodec

        frames = fixtures.video("foreman", num_frames=args.frames)
        for q in sweep.video_q_scales:
            codec = VideoCodec(quantization_scale=q, codebook_policy=args.codebook_policy)
            recons, bits = codec.encode_decode_sequence(frames)
            psnr = float(np.mean([calc_psnr(frames[t], recons[t]) for t in range(frames.shape[0])]))
            bpp = float(np.mean(bits / (frames[0].size / 3)))
            points.append({"q": q, "bpp": round(bpp, 4), "psnr_db": round(psnr, 3)})
    elif args.kind == "dpcm":
        from ivclab_tpu.models.dpcm import PredictiveCodec

        img = fixtures.image("lena")
        for q in sweep.dpcm_quant_steps:
            recon, _, bpp = PredictiveCodec(quant_step=float(q)).encode_decode(img, return_bpp=True)
            points.append({"q": q, "bpp": round(bpp, 4), "psnr_db": round(float(calc_psnr(img, recon)), 3)})
    else:
        raise SystemExit(f"unknown sweep kind {args.kind}")
    print(json.dumps({"kind": args.kind, "points": points}))


def cmd_info(args):
    from ivclab_tpu.runtime.container import IntraPayload

    p = IntraPayload.from_bytes(Path(args.input).read_bytes())
    print(
        json.dumps(
            {
                "kind": p.kind,
                "shape": list(p.shape),
                "quantization_scale": p.quantization_scale,
                "num_symbols": p.num_symbols,
                "payload_bits": p.payload_bits,
                "container_bytes": p.container_bytes,
                "codebook_symbols": int(p.codebook.lengths.size),
                "layout": "grouped" if p.layout else "contiguous",
            }
        )
    )


def build_parser():
    ap = argparse.ArgumentParser(prog="ivclab_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("encode-image")
    p.add_argument("input"); p.add_argument("output")
    p.add_argument("--q", type=float, default=1.0)
    p.add_argument("--train", default=None)
    p.set_defaults(fn=cmd_encode_image)

    p = sub.add_parser("decode-image")
    p.add_argument("input"); p.add_argument("output")
    p.set_defaults(fn=cmd_decode_image)

    p = sub.add_parser("roundtrip-image")
    p.add_argument("input")
    p.add_argument("--q", type=float, default=1.0)
    p.add_argument("--train", default=None)
    p.set_defaults(fn=cmd_roundtrip_image)

    p = sub.add_parser("encode-video")
    p.add_argument("input")
    p.add_argument("--q", type=float, default=1.0)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--gop", type=int, default=None)
    p.add_argument("--search-range", type=int, default=4)
    p.add_argument("--codebook-policy", default="per-frame")
    p.set_defaults(fn=cmd_encode_video)

    p = sub.add_parser("rd-sweep")
    p.add_argument("--kind", default="image", choices=["image", "video", "dpcm"])
    p.add_argument("--frames", type=int, default=6)
    p.add_argument("--codebook-policy", default="per-frame")
    p.set_defaults(fn=cmd_rd_sweep)

    p = sub.add_parser("info")
    p.add_argument("input")
    p.set_defaults(fn=cmd_info)
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
