"""Analytic FLOP counts + achieved-TFLOP/s roofline audit.

Computes exact matmul/conv FLOPs for each tower of the flagship model
(xattn fusion, WavLM-base audio, ResNet18 video) from the architecture
geometry, and divides the hardware-measured per-iteration times from
benchmarks/RESULTS.md by them to report achieved TFLOP/s and the fraction
of the v5e peak.  Pure host arithmetic — no TPU, no JAX.

Usage: python benchmarks/roofline.py  (prints a markdown table)

The measured times are pinned constants with provenance comments; re-run
the cited benches to refresh them.  Elementwise/normalization FLOPs are
excluded (they are bandwidth, not MXU, work), so the reported TFLOP/s is
the *useful matmul* rate — the number that should approach peak.
"""

from __future__ import annotations

# v5e peak (bf16 MXU): 197 TFLOP/s per chip.
V5E_PEAK_TFLOPS = 197.0

# ---------------------------------------------------------------------------
# WavLM-base (models/wavlm.py; geometry = microsoft/wavlm-base)


def wavlm_conv_fe_flops(t_samples: int = 48000) -> int:
    dims = (512,) * 7
    kernels = (10, 3, 3, 3, 3, 2, 2)
    strides = (5, 2, 2, 2, 2, 2, 2)
    cin, t, total = 1, t_samples, 0
    for cout, k, s in zip(dims, kernels, strides):
        t = (t - k) // s + 1
        total += 2 * k * cin * cout * t
        cin = cout
    return total


def wavlm_seq_len(t_samples: int = 48000) -> int:
    t = t_samples
    for k, s in zip((10, 3, 3, 3, 3, 2, 2), (5, 2, 2, 2, 2, 2, 2)):
        t = (t - k) // s + 1
    return t  # 149 for 3 s @ 16 kHz


def wavlm_encoder_flops(t: int, layers: int = 12, e: int = 768,
                        ffn: int = 3072) -> int:
    per_layer = (
        4 * 2 * t * e * e        # q, k, v, out projections
        + 2 * 2 * t * t * e      # scores + PV
        + 2 * 2 * t * e * ffn    # FFN up + down
        + 2 * t * e * 2 * e // 12  # rel-pos gate (e -> 2e per head group), small
    )
    # conv positional embedding: grouped conv k=128, groups=16
    pos_conv = 2 * t * 128 * e * (e // 16)
    # feature projection 512 -> 768
    feat_proj = 2 * t * 512 * e
    return layers * per_layer + pos_conv + feat_proj


def wavlm_forward_flops(t_samples: int = 48000) -> int:
    return wavlm_conv_fe_flops(t_samples) + wavlm_encoder_flops(
        wavlm_seq_len(t_samples)
    )


# ---------------------------------------------------------------------------
# ResNet18 video tower (models/resnet.py; torchvision geometry, 112x112 in)


def _conv_flops(h: int, w: int, cin: int, cout: int, k: int, s: int) -> tuple:
    ho, wo = h // s, w // s
    return 2 * k * k * cin * cout * ho * wo, ho, wo


def resnet18_flops(h: int = 112, w: int = 112) -> int:
    total, h, w = _conv_flops(h, w, 3, 64, 7, 2)
    h, w = h // 2, w // 2  # maxpool
    stages = ((64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2))
    for cin, cout, s in stages:
        f, h, w = _conv_flops(h, w, cin, cout, 3, s)      # block1 conv1
        total += f
        f, _, _ = _conv_flops(h, w, cout, cout, 3, 1)     # block1 conv2
        total += f
        if s != 1 or cin != cout:                          # downsample 1x1
            total += 2 * cin * cout * h * w
        for _ in range(2):                                 # block2 convs
            f, _, _ = _conv_flops(h, w, cout, cout, 3, 1)
            total += f
    return total


# ---------------------------------------------------------------------------
# Fusion block (models/fusion.py xattn: Tv=8, Ta=149, d=128)


def fusion_block_flops(tv: int = 8, ta: int = 149, d: int = 128,
                       dv: int = 512, da: int = 768, classes: int = 8) -> int:
    proj = 2 * tv * dv * d + 2 * ta * da * d            # v_in/audio_seq proj
    qkv_out = 2 * 4 * 2 * (tv + ta) * d * d / 2          # both directions
    attn = 2 * (2 * tv * ta * d) * 2                     # v2a + a2v scores/PV
    head = 2 * (2 * d) * 256 + 2 * 256 * classes         # concat MLP
    return int(proj + qkv_out + attn + head)


# ---------------------------------------------------------------------------
# Measured points (benchmarks/RESULTS.md; scan-slope, fetch-synced, v5e)

MEASURED = [
    # (name, batch, flops_per_sample, seconds_per_iteration, note)
    ("WavLM tower fwd (all-fused kernels)", 128, wavlm_forward_flops(),
     73.0e-3, "RESULTS.md round-2: 90.1 ms modular -> 73.0 ms fused"),
    ("WavLM tower fwd (modular XLA)", 128, wavlm_forward_flops(),
     90.1e-3, "RESULTS.md round-2 decomposition"),
    ("Video tower fwd (ResNet18 x 8 frames)", 128, 8 * resnet18_flops(),
     11.1e-3, "RESULTS.md round-2 decomposition"),
    ("Fusion block (modular XLA)", 64, fusion_block_flops(),
     53e-6, "RESULTS.md full-block kernel section"),
    ("Full flagship fwd (fused, bench.py)", 64,
     wavlm_forward_flops() + 8 * resnet18_flops() + fusion_block_flops(),
     33.3e-3, "115,307 clips/min headline"),
    # Train step ~= fwd + 2x bwd over the trainable scope. All-trainable:
    # 3x full fwd FLOPs is the standard estimate.
    ("Train step b64 (all-trainable, fused VJP)", 64,
     3 * (wavlm_forward_flops() + 8 * resnet18_flops() + fusion_block_flops()),
     166.0e-3, "RESULTS.md training table"),
]


def main() -> None:
    print("| Path | FLOPs/sample | Measured | Achieved | % of v5e peak |")
    print("|---|---|---|---|---|")
    for name, b, fps, sec, _note in MEASURED:
        tflops = b * fps / sec / 1e12
        pct = 100.0 * tflops / V5E_PEAK_TFLOPS
        print(
            f"| {name} | {fps / 1e9:.2f} GF | {sec * 1e3:.1f} ms (b{b}) "
            f"| {tflops:.1f} TFLOP/s | {pct:.0f}% |"
        )


if __name__ == "__main__":
    main()
