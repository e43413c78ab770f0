"""In-model A/B of the int8 spatial eligibility gate (ops/quant.py
MAX_QUANT_PIXELS) on Xception bf16 serving at 512² os16.

The gate-edge probe (int8_probe.py --gate-edge) showed the quantize/
dequantize passes at large spatial sizes are 5× slower than the bf16 conv
they replace STANDALONE — but in-model XLA fuses the quantize into the
producer, so the standalone number overcharges.  This measures the real
end-to-end int8 inference speedup with the 127²-entry sites quantized
(gate None) vs kept float (gate 4096 px), through bench.py's own
methodology.

Usage: python tools/int8_spatial_ab.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import bench
from deeplabv3plus_keras_tpu.ops import quant


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    for gate in (None, 4096):
        quant.MAX_QUANT_PIXELS = gate
        rows = bench._addon_rows(
            512, 16, steps=50, repeats=3, dtype="bfloat16",
            base_model="xception", prefix=f"gate_{gate}_",
            measure=("infer",), int8=True,
        )
        print(f"MAX_QUANT_PIXELS={gate}: {rows}", flush=True)


if __name__ == "__main__":
    main()
