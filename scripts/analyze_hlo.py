"""HBM-traffic breakdown of the train step from the optimized HLO (VERDICT r5
item #4: find where the 24 GB/step goes before guessing at remat/dtype fixes).

Compiles the SAME K-step block as scripts/profile_train.py, takes the
post-optimization HLO module text, and for every instruction estimates
HBM bytes = output bytes + operand bytes (for fusions: the fusion's operands
and outputs — internal producer/consumer traffic stays in registers/VMEM and
is correctly NOT counted). Instructions are attributed to model components by
their `metadata op_name` scope (jax name stack: encoder / mt_decoder /
unit_decoder / ctc / adam ...). Parameters and constants feeding many ops are
counted once per consuming instruction, like XLA's cost model does, so the
total overstates unique traffic — the value is in the RANKING and the
component split, not the absolute sum.

Usage:
  python scripts/analyze_hlo.py [--batch 8] [--frames 1024] [--k 10]
      [--mode full|fwd+bwd|fwd-only] [--top 40] [--out /tmp/hlo_traffic.json]
"""

import argparse
import collections
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
               "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
               "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred|"
                      r"f8e4m3fn|f8e5m2)\[([0-9,]*)\]")


def shape_bytes(text: str) -> int:
    """Sum the byte sizes of every concrete array shape in `text` (handles
    tuple shapes by summing members)."""
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%([\w.\-]+) = "
    r"(\(.*?\)|[a-z0-9]+\[[0-9,]*\](?:\{[^}]*\})?)\s+([\w\-]+)\(")
META_RE = re.compile(r'metadata=\{[^}]*op_name="([^"]*)"')
SRC_RE = re.compile(r'source_file="([^"]+)"(?:.*?source_line=(\d+))?')


def component_of(op_name: str, src: str) -> str:
    """Coarse attribution. The TPU backend truncates the jax name stack to
    opaque wrappers (`while/body/closed_call`), so the SOURCE FILE recorded
    in metadata is the reliable signal; op_name breaks ties."""
    low = (src or "").lower()
    by_file = [
        ("ctc", ("pallas_ctc.py", "/ctc.py")),
        ("attention_kernel", ("pallas_attention.py",)),
        ("encoder", ("conformer.py",)),
        ("decoders", ("transformer.py",)),
        ("attention/layers", ("layers.py",)),
        ("criterion", ("criterion.py",)),
        ("optimizer", ("trainer.py", "optax", "/lr.py")),
        ("specaugment/data", ("specaugment.py", "synthetic.py")),
        ("masks", ("masks.py", "streamspeech.py")),
    ]
    for name, keys in by_file:
        if any(k in low for k in keys):
            return name
    o = (op_name or "").lower()
    if "transpose" in o or "copy" in o:
        return "layout/copy"
    return "other"


def analyze(hlo_text: str, top: int):
    rows = []
    comp = collections.Counter()
    opkind = collections.Counter()
    cur_computation = ""
    for line in hlo_text.splitlines():
        s = line.strip()
        if s.endswith("{") and ("ENTRY" in s or s.startswith("%")):
            cur_computation = s.split()[0].lstrip("%")
            continue
        if "fused" in cur_computation:
            continue  # fusion-internal: producer/consumer stays on-chip
        m = INSTR_RE.match(line)
        if not m:
            continue
        name, out_shape, kind = m.groups()
        if kind in ("parameter", "constant", "tuple", "get-tuple-element",
                    "bitcast", "while", "conditional", "call"):
            # control-flow wrappers re-list the whole carried state — their
            # bodies' instructions are counted directly instead
            continue
        # bytes = OUTPUT bytes only: the TPU HLO text prints operands as
        # bare names, so reads are not countable per-line. Every output is
        # written once and read by >=1 consumer, so output-bytes ranks
        # producers correctly and ~halves absolute traffic.
        b = shape_bytes(out_shape)
        meta = META_RE.search(line)
        op_name = meta.group(1) if meta else ""
        sm = SRC_RE.search(line)
        src = sm.group(1) if sm else ""
        src_line = sm.group(2) if sm and sm.group(2) else ""
        short_src = "/".join(src.rsplit("/", 2)[-2:]) + (
            ":" + src_line if src_line else "")
        rows.append({"instr": name, "kind": kind, "bytes": b,
                     "op_name": op_name[-90:], "src": short_src,
                     "computation": cur_computation[:40]})
        comp[component_of(op_name, src)] += b
        opkind[kind] += b
    rows.sort(key=lambda r: -r["bytes"])
    total_bytes = sum(r["bytes"] for r in rows)  # ALL instructions, pre-trunc
    return rows[:top], comp, opkind, total_bytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--mt-len", type=int, default=48)
    ap.add_argument("--units-len", type=int, default=256)
    ap.add_argument("--text-len", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="full")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--out", default="/tmp/hlo_traffic.json")
    ap.add_argument("--dump-hlo", default="")
    ap.add_argument("--hlo-file", default="",
                    help="analyze an existing HLO dump instead of compiling")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.remat:
        import os

        os.environ["STREAMSPEECH_REMAT"] = "1"

    if args.hlo_file:
        rows, comp, opkind, total = analyze(Path(args.hlo_file).read_text(),
                                            args.top)
        report(args, rows, comp, opkind, None, total)
        return

    import jax

    from profile_train import build

    state, stacked, block = build(args.batch, args.frames, args.mt_len,
                                  args.units_len, args.text_len, args.k,
                                  mode=args.mode)
    s_avals = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    b_avals = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), stacked)
    low = block._lower(s_avals, b_avals)
    compiled = low.compile()
    hlo = compiled.as_text()
    print(f"optimized HLO: {len(hlo.splitlines())} lines", file=sys.stderr)
    if args.dump_hlo:
        Path(args.dump_hlo).write_text(hlo)
        print(f"raw HLO -> {args.dump_hlo}", file=sys.stderr)

    rows, comp, opkind, total = analyze(hlo, args.top)
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    report(args, rows, comp, opkind, ca, total)


def report(args, rows, comp, opkind, ca, total_bytes):
    out = {
        "config": {"batch": args.batch, "frames": args.frames,
                   "mode": args.mode, "remat": args.remat},
        "xla_bytes_accessed_gb": round(
            float(ca.get("bytes accessed", 0.0)) / 1e9, 3) if ca else None,
        "xla_flops_t": round(float(ca.get("flops", 0.0)) / 1e12, 4)
        if ca else None,
        # ALL instructions — comparable to xla_bytes_accessed_gb (write side)
        "sum_output_bytes_gb": round(total_bytes / 1e9, 3),
        # just the listed top-N (was wrongly reported as the sum before r5c)
        "top_output_bytes_gb": round(sum(r["bytes"] for r in rows) / 1e9, 3),
        "by_component_gb": {k: round(v / 1e9, 4)
                            for k, v in comp.most_common()},
        "by_opkind_gb": {k: round(v / 1e9, 4)
                         for k, v in opkind.most_common(15)},
        "top_instructions": [
            {**r, "mb": round(r.pop("bytes") / 1e6, 2)} for r in rows],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("xla_bytes_accessed_gb", "xla_flops_t",
                       "sum_output_bytes_gb", "by_component_gb",
                       "by_opkind_gb")}, indent=1))
    for r in out["top_instructions"][:25]:
        print(f"{r['mb']:10.2f} MB  {r['kind']:<14} {r['src']:<40} "
              f"{r['op_name'][-70:]}")
    print(f"full report: {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
