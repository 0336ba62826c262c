#!/usr/bin/env python
"""TPU probe: bf16 vs dynamic-int8 3x3 convs at the SD VAE DECODER's
per-level shapes (batch 8, 512^2 output) — does the 64^2x320 UNet finding
(int8 loses at large-spatial/small-channel shapes, probe_requant.py) apply
to the decoder's upper levels too?  Decides VaeConfig.quant_skip_levels."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from scripts.probe_requant import probe_shape


def main():
    print("platform:", jax.devices()[0].platform)
    # decoder levels (level 0 = highest resolution, VaeConfig order)
    for level, shape in ((0, (8, 512, 512, 128)), (1, (8, 256, 256, 256)),
                         (2, (8, 128, 128, 512))):
        res = probe_shape(*shape, variants=("bf16", "dynamic"))
        b, h, w, c = shape
        bf, dyn = res["bf16"], res["dynamic"]
        print(
            f"level {level} [{b}x{h}x{w}x{c}] bf16 {bf[0]:.3f} ms ({bf[1]:.0f} T/s)"
            f"  int8 {dyn[0]:.3f} ms ({dyn[1]:.0f} T/s)"
            f"  speedup {bf[0] / dyn[0]:.2f}x"
        )


if __name__ == "__main__":
    main()
