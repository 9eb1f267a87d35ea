#!/usr/bin/env python3
"""Live scope for demodulator output: FFT magnitude + time domain.

Parity utility for the reference's plot.py (chunked struct-unpack of the
float stream, plot.py:38-53; animated two-pane FFT + time view,
plot.py:56-113), re-implemented for this framework:

    ... | python -m demodulator_tpu -i - -o - ... | python tools/plot.py 96000

Args: SAMPRATE [PREC] [BUFSHIFT] — PREC nonzero selects float64 input
(the reference's -DSET_PRECISION output mode), BUFSHIFT scales the chunk
size by 2^shift like the reference CLI.  Requires matplotlib; without a
display use --once to dump a single PNG.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def reader(f, count: int, dtype):
    """Yield consecutive chunks of `count` samples from a raw float stream."""
    nbytes = count * np.dtype(dtype).itemsize
    while True:
        data = f.read(nbytes)
        if len(data) < nbytes:
            return
        yield np.frombuffer(data, dtype=dtype)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("samprate", type=float)
    ap.add_argument("prec", type=int, nargs="?", default=0)
    ap.add_argument("bufshift", type=int, nargs="?", default=0)
    ap.add_argument("--once", metavar="OUT.png",
                    help="render the first chunk to a PNG and exit "
                         "(headless use)")
    args = ap.parse_args(argv)

    dtype = np.float64 if args.prec else np.float32
    count = 4096 << args.bufshift if args.bufshift >= 0 \
        else 4096 >> -args.bufshift
    chunks = reader(sys.stdin.buffer, count, dtype)

    import matplotlib
    if args.once:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax_f, ax_t) = plt.subplots(2, 1, figsize=(9, 6))
    freqs = np.fft.rfftfreq(count, 1.0 / args.samprate)
    t = np.arange(count) / args.samprate
    first = next(chunks, None)
    if first is None:
        print("no data on stdin", file=sys.stderr)
        return 1

    def spectrum(x):
        mag = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        return 20 * np.log10(np.maximum(mag, 1e-12))

    (line_f,) = ax_f.plot(freqs, spectrum(first))
    ax_f.set_xlabel("Hz")
    ax_f.set_ylabel("dB")
    ax_f.set_title("spectrum")
    (line_t,) = ax_t.plot(t, first)
    ax_t.set_xlabel("s")
    ax_t.set_title("time domain")
    fig.tight_layout()

    if args.once:
        fig.savefig(args.once, dpi=100)
        print(f"wrote {args.once}", file=sys.stderr)
        return 0

    from matplotlib.animation import FuncAnimation

    def update(_frame):
        x = next(chunks, None)
        if x is None:
            plt.close(fig)
            return line_f, line_t
        line_f.set_ydata(spectrum(x))
        line_t.set_ydata(x)
        ax_t.relim()
        ax_t.autoscale_view()
        return line_f, line_t

    _anim = FuncAnimation(fig, update, interval=30, blit=False,
                          cache_frame_data=False)
    plt.show()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
