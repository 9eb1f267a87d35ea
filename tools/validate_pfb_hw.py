#!/usr/bin/env python3
"""Hardware validation + timing for the generalized fused PFB front
(ops/pallas/fused_pfb.py, C in {4, 8, 16, 32, 64}).

One Mosaic compile per C: correctness (vs the XLA call_split front,
two streamed blocks, random input — angle-wrapped error, SNR, exact
state carry) and timing run at the SAME block shape, chosen to match
the bench matrix / pipeline defaults so the persistent compile cache
carries over.

    python tools/validate_pfb_hw.py [C ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# C → block rows (128 complex samples each).  8 → the bench
# channel_bank_8ch_pfb shape (1.536 MHz x 0.25 s); 4 → the nearest
# 8-aligned shape to the bank4 CLI block; 64 → the bench 64ch shape.
ROWS = {4: 1536, 8: 3000, 16: 3000, 32: 3000, 64: 24000}


def main():
    import jax
    import jax.numpy as jnp
    from demodulator_tpu.ops.channelizer import PolyphaseChannelizer
    from demodulator_tpu.ops import conditioning as cond_ops
    from demodulator_tpu.ops import demod as demod_ops
    from demodulator_tpu.ops.pallas.fused_pfb import fused_pfb_demod
    from demodulator_tpu.cli import _enable_compile_cache
    _enable_compile_cache()

    cs = [int(a) for a in sys.argv[1:]] or [4, 8]
    print("backend:", jax.default_backend(), flush=True)
    for C in cs:
        rng = np.random.default_rng(7)
        pfb = PolyphaseChannelizer(C)
        T = ROWS[C] * 128

        fused = jax.jit(lambda x, h: fused_pfb_demod(x, h, pfb._h_np, C=C))

        def xla_front(x, h):
            xi, xq = cond_ops.split_iq_u16(x, jnp.float32)
            yer, yei, yor, yoi, nh = pfb.call_split(jnp.stack([xi, xq]), h)
            return demod_ops.fm_demod_split(yer, yei, yor, yoi,
                                            fast=True), nh
        xf = jax.jit(xla_front)

        # correctness: two streamed blocks
        hist_x = pfb.init_hist()
        hist_k = jnp.zeros((2, pfb.hist_len), jnp.float32)
        worst, snr_w, same = 0.0, 1e9, True
        t0 = time.perf_counter()
        for blk in range(2):
            u16 = jnp.asarray(rng.integers(0, 1 << 16, T, dtype=np.uint16))
            d_ref, hist_x = xf(u16, hist_x)
            d, hist_k = fused(u16, hist_k)
            d = np.asarray(d).reshape(-1, C)
            e = np.mod(d.astype(np.float64)
                       - np.asarray(d_ref, np.float64) + np.pi,
                       2 * np.pi) - np.pi
            worst = max(worst, float(np.abs(e).max()))
            snr = 10 * np.log10(np.mean(np.asarray(d_ref) ** 2)
                                / max(np.mean(e ** 2), 1e-300))
            snr_w = min(snr_w, snr)
            same = same and np.array_equal(np.asarray(hist_k),
                                           np.asarray(hist_x))
        print(f"C={C}: max|dphi|={worst:.2e}  snr={snr_w:.1f} dB  "
              f"state_exact={same}  (compile+2blk "
              f"{time.perf_counter()-t0:.1f}s)", flush=True)

        # timing (warm): same shape, chained state, on-device fori_loop —
        # per-call dispatch through the remote tunnel is ~1 ms, far above
        # the step itself (same rationale as bench.py _timed_loop)
        u16 = jnp.asarray(rng.integers(0, 1 << 16, T, dtype=np.uint16))
        for name, raw in (("fused",
                           lambda x, h: fused_pfb_demod(x, h, pfb._h_np,
                                                        C=C)),
                          ("xla", xla_front)):
            # slope between two on-device loop lengths: the per-call
            # dispatch through the remote tunnel is tens of ms, so a
            # single-loop average overstates a ~100 us step several-fold
            # (same method as bench.py _timed_loop)
            def timed(n, f=raw):
                @jax.jit
                def looped(x, h):
                    def body(i, carry):
                        h, acc = carry
                        d, h2 = f(x, h)
                        return h2, acc + d[0, 0]
                    return jax.lax.fori_loop(
                        0, n, body, (h, jnp.float32(0.0)))
                h0 = jnp.zeros((2, pfb.hist_len), jnp.float32)
                jax.block_until_ready(looped(u16, h0))  # compile+warm
                best = 1e9
                for _ in range(4):
                    t0 = time.perf_counter()
                    jax.block_until_ready(looped(u16, h0))
                    best = min(best, time.perf_counter() - t0)
                return best
            dt = (timed(70) - timed(10)) / 60
            print(f"C={C} {name}: {dt*1e6:8.1f} us/block  "
                  f"{T/dt/1e9:6.2f} Gsps", flush=True)


if __name__ == "__main__":
    main()
