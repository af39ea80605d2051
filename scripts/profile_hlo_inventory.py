#!/usr/bin/env python
"""Static HLO inventory of the flagship batched16 predict program.

The batched16 headline has sat at 241 img/s for three rounds at 68% HBM /
14% MFU; if it is bandwidth-bound the roof is ~1.47x away.  This script
answers "where do the 36.9 GB go": it compiles the flagship predict step
exactly as bench.py does, walks the optimized HLO, charges every
instruction its operand+output bytes (the HBM cost model for a
memory-bound program — fusions count their parameters and outputs, not
internals), and prints the top instructions and per-category totals.

Usage: python scripts/profile_hlo_inventory.py [batch] [backbone] [top_n]
(defaults 16, hardnet39, 25)
"""

import collections
import os
import re
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from two_stage_object_detection_tpu.config import Config
from two_stage_object_detection_tpu.nets.detector import FasterRCNN

DTYPE_BYTES = {"f32": 4, "f16": 2, "bf16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2,
               "u16": 2, "f8e4m3fn": 1, "f8e5m2": 1}

SHAPE_RE = re.compile(r"\b(" + "|".join(DTYPE_BYTES) + r")\[([0-9,]*)\]")


def shape_bytes(text: str) -> int:
    """Sum byte sizes of every typed shape literal in ``text``."""
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main(batch=16, backbone="hardnet39", top_n=25):
    cfg = Config(backbone=backbone)
    model = FasterRCNN(cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    images = jnp.zeros((batch, *cfg.input_size, 3), jnp.float32)

    fn = jax.jit(lambda v, im: model.apply(v, im, method="predict"))
    compiled = fn.lower(variables, images).compile()
    hlo = compiled.as_text()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print(f"cost_analysis: flops={ca.get('flops', 0) / 1e9:.1f} G  "
          f"bytes={ca.get('bytes accessed', 0) / 1e9:.2f} GB", flush=True)

    # entry-computation instructions: "  %name = <shape> op(...)" lines.
    # Charge each non-trivial op its output shape + operand shapes (operand
    # shapes appear inline in HLO text as typed literals).
    rows = []
    cat_bytes = collections.Counter()
    cat_count = collections.Counter()
    main_body = hlo.split("ENTRY ")[-1]
    for line in main_body.splitlines():
        line = line.strip()
        m = re.match(r"%?([\w.\-]+)\s*=\s*(.*)$", line)
        if not m:
            continue
        name, rhs = m.groups()
        opm = re.match(r"(?:\([^)]*\)|\S+)\s+([\w\-]+)\(", rhs)
        op = opm.group(1) if opm else "?"
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast", "?"):
            continue
        b = shape_bytes(rhs.split(", calls=")[0].split(", metadata=")[0])
        # category: fusion kind or op; pull the fused computation name for
        # a hint of what's inside
        kind = re.search(r"kind=(\w+)", rhs)
        cat = f"fusion.{kind.group(1)}" if op == "fusion" else op
        meta = re.search(r'op_name="([^"]*)"', rhs)
        hint = meta.group(1)[-90:] if meta else ""
        rows.append((b, name, cat, hint))
        cat_bytes[cat] += b
        cat_count[cat] += 1

    total = sum(r[0] for r in rows)
    print(f"\nsummed operand+output bytes: {total / 1e9:.2f} GB "
          f"(upper bound: fusion operands double-counted)\n")
    print("=== per-category ===")
    for cat, b in cat_bytes.most_common(15):
        print(f"  {cat:28s} {b / 1e9:7.3f} GB  x{cat_count[cat]}")
    print(f"\n=== top {top_n} instructions ===")
    for b, name, cat, hint in sorted(rows, reverse=True)[:top_n]:
        print(f"  {b / 1e6:9.1f} MB  {cat:22s} {name:28s} {hint}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 16, a[1] if len(a) > 1 else "hardnet39",
         int(a[2]) if len(a) > 2 else 25)
