"""Analytic A100 roofline for the reference ViDAR ``forward_test``.

Grounds the ``A100_FORECAST_FPS_ESTIMATE`` constant in bench.py (the
reference publishes NO latency/throughput numbers anywhere — SURVEY §6), by
counting the FLOPs/bytes of the exact eval workload and bounding the
achievable A100 rate per phase. Workload shapes from the flagship config
(reference projects/configs/vidar_pretrain/nusc_1_8_subset/
vidar_1_8_nusc_3future.py): 6 cams, 928x1600 padded images, queue 4+1
history frames, 6 future frames, bev 200x200, embed 256.

Run: python benchmarks/a100_roofline.py   (pure host arithmetic, no jax)
"""

import json

# ---------------------------------------------------------------- hardware
# A100-SXM4-80G (the 8xA100 nodes of the reference README):
A100 = dict(
    fp32_tflops=19.5,        # CUDA cores
    tf32_tflops=156.0,       # tensor cores, TF32 (dense)
    hbm_tbps=2.039,          # HBM2e
)
# The reference trains/evals in fp32 and force-disables TF32 twice
# (reference tools/train.py:141-144 `close_tf32`, encoder.py:97-100) — but
# cuDNN conv kernels predate that switch path and the published configs do
# not set close_tf32 for TEST; give A100 the benefit of the doubt and score
# convs at TF32 tensor-core rate with a strong 60% efficiency, everything
# else fp32.
CONV_EFF = 0.60      # measured-typical cuDNN large-conv efficiency
GEMM_EFF = 0.50      # small-N GEMMs of attention projections
GATHER_EFF = 0.35    # random-row HBM efficiency for deformable sampling

# ---------------------------------------------------------------- shapes
IMG_H, IMG_W = 928, 1600
NUM_CAMS = 6
FRAMES = 5            # 4 history + current (all encoded per sample)
FUTURE = 6            # test_future_frame_num
BEV = 200 * 200
C = 256
HEADS, LEVELS, POINTS = 8, 4, 8
ENC_LAYERS = 6
DEC_LAYERS = 3


def resnet101_dcn_macs(h, w):
    """Per-image MACs of caffe-style ResNet-101 (stages 3-4 DCN adds the
    18-channel offset convs; the deformable gather itself is memory-bound
    and counted in bytes below)."""
    macs = 0.0

    def conv(cin, cout, k, oh, ow, groups=1):
        return oh * ow * cout * cin * k * k / groups

    oh, ow = h // 2, w // 2
    macs += conv(3, 64, 7, oh, ow)                   # stem
    oh, ow = h // 4, w // 4

    def bottleneck(cin, cmid, cout, oh, ow, stride, dcn=False, first=False):
        m = conv(cin, cmid, 1, oh * stride, ow * stride)
        m += conv(cmid, cmid, 3, oh, ow)
        if dcn:
            m += conv(cmid, 27, 3, oh, ow)           # DCNv2 offset+mask conv
        m += conv(cmid, cout, 1, oh, ow)
        if first:
            m += conv(cin, cout, 1, oh, ow)          # downsample proj
        return m

    # stage1: 3 blocks @ /4, 64->256
    macs += bottleneck(64, 64, 256, oh, ow, 1, first=True)
    macs += 2 * bottleneck(256, 64, 256, oh, ow, 1)
    # stage2: 4 blocks @ /8
    oh, ow = h // 8, w // 8
    macs += bottleneck(256, 128, 512, oh, ow, 2, first=True)
    macs += 3 * bottleneck(512, 128, 512, oh, ow, 1)
    # stage3: 23 blocks @ /16, DCN
    oh, ow = h // 16, w // 16
    macs += bottleneck(512, 256, 1024, oh, ow, 2, dcn=True, first=True)
    macs += 22 * bottleneck(1024, 256, 1024, oh, ow, 1, dcn=True)
    # stage4: 3 blocks @ /32, DCN
    oh, ow = h // 32, w // 32
    macs += bottleneck(1024, 512, 2048, oh, ow, 2, dcn=True, first=True)
    macs += 2 * bottleneck(2048, 512, 2048, oh, ow, 1, dcn=True)
    # FPN: 1x1 laterals + 3x3 smooth on 4 levels (/8../64, 256ch out)
    for s in (8, 16, 32, 64):
        cin = {8: 512, 16: 1024, 32: 2048, 64: 2048}[s]
        macs += conv(cin, 256, 1, h // s, w // s)
        macs += conv(256, 256, 3, h // s, w // s)
    return macs


def main(conv_tf32: bool = True, img_h=IMG_H, img_w=IMG_W,
         num_cams=NUM_CAMS, future=FUTURE, quiet=False):
    img_macs = resnet101_dcn_macs(img_h, img_w)
    n_imgs = num_cams * FRAMES
    backbone_tflops = 2 * img_macs * n_imgs / 1e12
    conv_rate = (A100['tf32_tflops'] if conv_tf32 else
                 A100['fp32_tflops']) * CONV_EFF
    backbone_s = backbone_tflops / conv_rate

    # encoder: per layer per frame — TSA + SCA projections (GEMM) + FFN,
    # plus the deformable gathers (bytes).
    # GEMM MACs per layer: qkv-ish projections.
    tsa_gemm = BEV * C * C * 3 + BEV * (2 * C) * (
        HEADS * 2 * 1 * 4 * 3)        # value/out proj + offset/weight heads
    # SCA runs offset/weight/value on the rebatched ~35% visible queries x6
    vis_q = int(0.35 * BEV) * num_cams
    sca_gemm = (vis_q * C * (HEADS * LEVELS * POINTS * 3) +
                num_cams * (img_h // 8) * (img_w // 8) * 1.33 * C * C +
                BEV * C * C)          # value proj over pyramid + out proj
    ffn_gemm = BEV * C * 512 * 2
    latent_gemm = BEV * C * (C // 16) * 2  # LoRA down/up at one layer
    enc_gemm_tflops = 2 * FRAMES * (
        ENC_LAYERS * (tsa_gemm + sca_gemm + ffn_gemm) + latent_gemm) / 1e12
    enc_gemm_s = enc_gemm_tflops / (A100['fp32_tflops'] * GEMM_EFF)

    # deformable gather bytes: each sample reads 4 corners x 32 f32 = 512 B
    sca_samples = vis_q * HEADS * LEVELS * POINTS
    tsa_samples = BEV * 2 * HEADS * 1 * 4
    enc_gather_bytes = FRAMES * ENC_LAYERS * (
        sca_samples + tsa_samples) * 512.0
    # latent rendering: 40k rays x 128 waypoints x (16+1) f32 grid_sample
    latent_bytes = FRAMES * BEV * 128 * 4 * 4 * 17
    enc_gather_s = (enc_gather_bytes + latent_bytes) / (
        A100['hbm_tbps'] * 1e12 * GATHER_EFF)

    # future rollout: 6 steps x 3 decoder layers (self+cross deform attn on
    # 40k queries, points 4/8) + per-layer MLP heads
    dec_samples = BEV * HEADS * (1 * 4 + 1 * 8)
    dec_gather_bytes = future * DEC_LAYERS * dec_samples * 512.0
    dec_gemm = future * DEC_LAYERS * (
        BEV * C * C * 4 + BEV * C * 512 * 2) + future * BEV * C * 16 * 5
    dec_s = (dec_gather_bytes / (A100['hbm_tbps'] * 1e12 * GATHER_EFF) +
             2 * dec_gemm / 1e12 / (A100['fp32_tflops'] * GEMM_EFF))

    # ray depth decode: argmax over 512 waypoints x 40k rays grid_sample
    decode_bytes = BEV * 513 * 4 * 4 * 16
    decode_s = decode_bytes / (A100['hbm_tbps'] * 1e12 * GATHER_EFF)

    total_s = backbone_s + enc_gemm_s + enc_gather_s + dec_s + decode_s
    # python/torch dispatch overhead: the reference launches ~3.3k CUDA
    # kernels per sample through mmcv module trees (measured-typical 15-25 us
    # each incl. gaps on this stack) — floor it at 15%.
    total_s *= 1.15

    report = {
        'conv_tf32': conv_tf32,
        'backbone_tflops': round(backbone_tflops, 1),
        'backbone_s': round(backbone_s, 3),
        'encoder_gemm_s': round(enc_gemm_s, 3),
        'encoder_gather_s': round(enc_gather_s, 3),
        'rollout_s': round(dec_s, 3),
        'decode_s': round(decode_s, 3),
        'total_s_per_sample': round(total_s, 3),
        'samples_per_s': round(1.0 / total_s, 3),
    }
    if not quiet:
        print(json.dumps(report, indent=2))
    return report



# ------------------------------------------------------------- train step
# The reference trains the flagship shape at bs 1/GPU on A100-80G in fp32
# (tools/train.py:141-144 close_tf32; configs/vidar_pretrain/nusc_1_8_subset/
# vidar_1_8_nusc_3future.py: queue 4+1, 3 futures, ~63 GB, README.md:143-148).
# Train-step cost model: forward (future=3) + backward at the standard
# conv/GEMM adjoint ratio (dL/dx + dL/dw ~= 2x forward FLOPs) and a 3x
# multiplier on the gather phases (forward gather + value-grad scatter +
# location-grad pass, mirroring the mmcv CUDA backward's three accumulation
# streams), plus the ray-supervision render (dvr autograd, ~2x the eval
# latent-render bytes) and a 5% optimizer/EMA overhead.
BWD_COMPUTE_MULT = 3.0     # fwd + bwd(2x) for convs/GEMMs
BWD_GATHER_MULT = 3.0      # fwd gather + scatter-grad + loc-grad
TRAIN_FUTURE = 3


def train_step(conv_tf32: bool = False, img_h=IMG_H, img_w=IMG_W,
               num_cams=NUM_CAMS):
    fwd = main(conv_tf32=conv_tf32, img_h=img_h, img_w=img_w,
               num_cams=num_cams, future=TRAIN_FUTURE, quiet=True)
    compute_s = fwd['backbone_s'] + fwd['encoder_gemm_s']
    gather_s = fwd['encoder_gather_s'] + fwd['rollout_s'] + fwd['decode_s']
    # ray-supervision sampling/render in the loss (dvr.cu autograd): the
    # train loss re-renders ~BEV rays x 512 grid steps fwd+bwd
    ray_bytes = (1 + TRAIN_FUTURE) * BEV * 512 * 4 * 4 * 2
    ray_s = ray_bytes / (A100['hbm_tbps'] * 1e12 * GATHER_EFF)
    total = (compute_s * BWD_COMPUTE_MULT + gather_s * BWD_GATHER_MULT +
             ray_s) * 1.05
    # the same 15% launch-overhead floor as forward (kernel count ~3x)
    total *= 1.15
    report = {
        'conv_tf32': conv_tf32,
        'fwd_s': fwd['total_s_per_sample'],
        'train_s_per_it': round(total, 2),
        'it_per_s': round(1.0 / total, 4),
    }
    print(json.dumps(report, indent=2))
    return report


if __name__ == '__main__':
    import sys
    if '--train' in sys.argv:
        # training runs fp32 (the reference force-disables TF32 in the
        # train CLI); print the TF32 bound too for completeness
        lo = train_step(conv_tf32=False)
        hi = train_step(conv_tf32=True)
        print(json.dumps({
            'a100_train_s_per_it_range': [hi['train_s_per_it'],
                                          lo['train_s_per_it']],
            'note': 'fp32 (reference close_tf32) is the faithful setting',
        }))
    elif '--openscene' in sys.argv:
        # OpenScene eval shape: 8 cams, 1080x1920 scaled 2/3 -> 736x1280
        hi = main(conv_tf32=True, img_h=736, img_w=1280, num_cams=8)
        lo = main(conv_tf32=False, img_h=736, img_w=1280, num_cams=8)
        print(json.dumps({
            'a100_openscene_forecast_fps_range': [lo['samples_per_s'],
                                                  hi['samples_per_s']],
        }))
    else:
        # upper bound: cuDNN convs ride TF32 tensor cores (PyTorch<=1.11
        # default; the reference's close_tf32 switch lives in the TRAIN CLI
        # only, tools/train.py:141-144)
        hi = main(conv_tf32=True)
        # lower bound: fp32 CUDA-core convs (the training configuration)
        lo = main(conv_tf32=False)
        print(json.dumps({
            'a100_forecast_fps_range': [lo['samples_per_s'],
                                        hi['samples_per_s']],
            'bench_py_central_estimate': 0.5,
        }))
