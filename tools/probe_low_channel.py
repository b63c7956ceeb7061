"""Probe the TPU cost model of the decoder's low-channel ops.

Hypothesis under test: XLA assigns channel-minor layouts and the (8, 128)
tile pads the lane (minor) dimension to 128, so every C<128 feature map is
physically 128/C times its logical size — which would explain why the
decoder's 32-channel 512^2 convs, transpconvs and seg head sit 3-7x off
their *logical* bandwidth floors (BASELINE.md round-3 trace).

Method: each candidate op runs inside one jit as a lax.scan over N
pre-materialized input slices (fresh HBM reads, no CSE), accumulated into a
carry, so the axon relay's ~3.5 ms/dispatch cannot pollute per-op numbers
(memory: isolated one-shot timings on this machine are fiction). Report
ms/op and achieved *logical* GB/s; compare variants, not absolutes.

Usage:  python tools/probe_low_channel.py [--n 6] [--iters 5]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6, help="scan length (input slices)")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dinounet_tpu.configuration import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    N = args.n

    def bench(name, make_inputs, body, logical_bytes):
        """body: (x_slice, carry) -> carry; carried across a scan over N slices."""
        xs, carry0 = make_inputs()

        @jax.jit
        def run(xs, carry):
            def step(c, x):
                return body(x, c), None
            c, _ = jax.lax.scan(step, carry, xs)
            return c

        out = run(xs, carry0)
        float(jnp.ravel(out)[0])  # warm + drain (block_until_ready no-ops on axon)
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = run(xs, carry0)
            float(jnp.ravel(out)[0])
            best = min(best, (time.perf_counter() - t0) / N)
        gbps = logical_bytes / best / 1e9
        print(f"{name:58s} {best*1e3:8.3f} ms/op  {gbps:7.1f} GB/s(logical)")
        return best

    key = jax.random.PRNGKey(0)
    B, H, W = 8, 512, 512

    # --- 1. element-wise pass at several channel widths: pure bandwidth ---
    print("== eltwise y = x * 1.0001 + c  on (8,512,512,C) bf16 ==")
    for C in (3, 32, 64, 128):
        def mk(C=C):
            xs = jax.random.normal(key, (N, B, H, W, C), jnp.bfloat16)
            return xs, jnp.zeros((B, H, W, C), jnp.bfloat16)
        bench(f"eltwise C={C}", mk, lambda x, c: x * 1.0001 + c,
              2 * B * H * W * C * 2)

    # --- 2. the stage2 conv0: 3x3 64->Cout at 512^2 ---
    print("== conv 3x3 Cin=64 at 512^2, bf16 (conv0 of decoder stage2) ==")
    wkey = jax.random.PRNGKey(1)

    def conv_nhwc(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for Cout, tag in ((32, "Cout=32 (status quo)"), (128, "Cout=128 (padded)")):
        def mk(Cout=Cout):
            xs = jax.random.normal(key, (N, B, H, W, 64), jnp.bfloat16)
            return xs, jnp.zeros((B, H, W, Cout), jnp.bfloat16)
        w = jax.random.normal(wkey, (3, 3, 64, Cout), jnp.bfloat16) * 0.01
        bench(f"conv3x3 64->{tag}", mk,
              lambda x, c, w=w: conv_nhwc(x, w) + c * 0.5,
              (B * H * W * (64 + Cout)) * 2)

    # pad-to-128 + slice back to 32 (the drop-in conv0 replacement)
    def mk64():
        xs = jax.random.normal(key, (N, B, H, W, 64), jnp.bfloat16)
        return xs, jnp.zeros((B, H, W, 32), jnp.bfloat16)
    w128 = jax.random.normal(wkey, (3, 3, 64, 128), jnp.bfloat16) * 0.01
    bench("conv3x3 64->128 then slice[:, :32]", mk64,
          lambda x, c: conv_nhwc(x, w128)[..., :32] + c * 0.5,
          (B * H * W * (64 + 32)) * 2)

    # NCHW formulation: channels out of the lane dimension entirely
    def mk_nchw(Cout=32):
        xs = jax.random.normal(key, (N, B, 64, H, W), jnp.bfloat16)
        return xs, jnp.zeros((B, 32, H, W), jnp.bfloat16)
    w32 = jax.random.normal(wkey, (3, 3, 64, 32), jnp.bfloat16) * 0.01
    wt = jnp.transpose(w32, (3, 2, 0, 1))  # OIHW
    bench("conv3x3 64->32 NCHW (bf01_oi01->bf01)", mk_nchw,
          lambda x, c: jax.lax.conv_general_dilated(
              x, wt, (1, 1), "SAME",
              dimension_numbers=("NCHW", "OIHW", "NCHW")) + c * 0.5,
          (B * H * W * (64 + 32)) * 2)

    # --- 3. k2s2 transposed conv 32->32, 256^2 -> 512^2 (encoder/up0 shape) ---
    print("== transpconv k2s2 32->32, 256^2 -> 512^2, bf16 ==")
    k = jax.random.normal(wkey, (2, 2, 32, 32), jnp.bfloat16) * 0.1

    def mk_tc():
        xs = jax.random.normal(key, (N, B, 256, 256, 32), jnp.bfloat16)
        return xs, jnp.zeros((B, 512, 512, 32), jnp.bfloat16)

    def tc_conv(x, c):
        y = jax.lax.conv_transpose(
            x, k, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + c * 0.5

    def tc_matmul(x, c):
        kk = k[::-1, ::-1].transpose(2, 0, 1, 3).reshape(32, 2 * 2 * 32)
        y = (x @ kk).reshape(B, 256, 256, 2, 2, 32)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 512, 512, 32)
        return y + c * 0.5

    tc_bytes = (B * 256 * 256 * 32 + B * 512 * 512 * 32) * 2
    bench("transpconv2x2 lax.conv_transpose (status quo)", mk_tc, tc_conv, tc_bytes)
    bench("transpconv2x2 matmul + depth-to-space", mk_tc, tc_matmul, tc_bytes)

    # --- 4. seg head: (8,512,512,32) bf16 @ (32,3) -> f32 ---
    print("== seg head 32->3 at 512^2, f32 logits ==")
    ws = jax.random.normal(wkey, (32, 3), jnp.bfloat16) * 0.1

    def mk_seg(out_shape):
        def f():
            xs = jax.random.normal(key, (N, B, H, W, 32), jnp.bfloat16)
            return xs, jnp.zeros(out_shape, jnp.float32)
        return f

    def seg_nhwc(x, c):
        y = jax.lax.dot_general(x, ws, (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y + c * 0.5

    def seg_nchw(x, c):
        y = jnp.einsum("bhwc,ck->bkhw", x, ws,
                       preferred_element_type=jnp.float32)
        return y + c * 0.5

    seg_bytes = B * H * W * 32 * 2 + B * H * W * 3 * 4
    bench("seg dot -> (B,H,W,3) (status quo)", mk_seg((B, H, W, 3)), seg_nhwc, seg_bytes)
    bench("seg einsum -> (B,3,H,W)", mk_seg((B, 3, H, W)), seg_nchw, seg_bytes)


if __name__ == "__main__":
    main()
