"""Per-op HBM-byte floors from MEASURED layouts (VERDICT r3 item 1).

The roofline's decoder floors assumed every C<128 bf16 map pays a 128-lane
padding tax. This tool stops assuming: it parses the compiled HLO's actual
layout annotations (minor-to-major order + tile, e.g.
``bf16[8,512,512,32]{3,0,2,1:T(8,128)(2,1)}``), computes each op's physical
operand/result bytes under those layouts, joins them with the xplane trace's
per-op durations, and prints achieved GB/s next to the 819 GB/s floor — so
"at floor" / "recoverable" claims rest on measured bytes, not layout guesses.

Physical-size rule (TPU): the tile ``T(t_penult, t_minor)`` pads the two
minor-most *physical* dims (per the minor-to-major permutation) up to
multiples of the tile; every other dim is unpadded. Sub-tiles like ``(2,1)``
(bf16 word packing) don't change padded element counts at the sizes here
(penultimate tile 8 is already even). 1-D tiles ``T(n)`` pad the single
minor dim.

Usage:
    python tools/hbm_floors.py /tmp/trace_r4/hlo.txt /tmp/trace_r4 \
        [--iters 4] [--filter decoder] [--min-ms 0.02]
"""

import argparse
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trace_attr import load_op_paths, load_xla_op_durations  # noqa: E402

HBM_GBPS = 819.0

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
                "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8, "s64": 8,
                "u64": 8}

# one typed shape with optional layout, e.g.
#   bf16[8,512,512,32]{3,0,2,1:T(8,128)(2,1)S(1)}
_SHAPE_RE = re.compile(
    r"(?P<dt>f32|bf16|f16|f64|s64|s32|s16|s8|u64|u32|u16|u8|pred)"
    r"\[(?P<dims>[\d,]*)\]"
    r"(?:\{(?P<mtm>[\d,]*)(?::(?P<rest>[^}]*))?\})?")

_TILE_RE = re.compile(r"T\(([\d,]+)\)")


def physical_bytes(dt: str, dims, mtm, rest) -> int:
    """Padded buffer size in bytes for one typed shape."""
    esize = _DTYPE_BYTES[dt]
    if rest and "S(1)" in rest:
        return 0  # memory space 1 = VMEM-resident: no HBM traffic
    if not dims:
        return esize
    dims = list(dims)
    if not mtm:  # no layout printed: assume default minor-to-major, (8,128)
        mtm = list(range(len(dims)))[::-1]
        tile = (8, 128) if len(dims) >= 2 else (128,)
    else:
        m = _TILE_RE.search(rest or "")
        if m:
            tile = tuple(int(t) for t in m.group(1).split(","))
        else:
            tile = (8, 128) if len(dims) >= 2 else (128,)
    # physical order major->minor is reversed(mtm); pad the k minor-most
    # physical dims by the tile
    phys = [dims[i] for i in reversed(mtm)]  # major .. minor
    k = min(len(tile), len(phys))
    for j in range(k):
        d_idx = len(phys) - k + j
        t = tile[j] if len(tile) == k else tile[-(k - j)]
        phys[d_idx] = math.ceil(phys[d_idx] / t) * t
    n = 1
    for d in phys:
        n *= d
    return n * esize


def parse_shapes(segment: str):
    """All typed shapes (with layouts) appearing in an HLO text segment."""
    out = []
    for m in _SHAPE_RE.finditer(segment):
        dims = [int(d) for d in m.group("dims").split(",") if d]
        mtm = [int(d) for d in (m.group("mtm") or "").split(",") if d != ""] \
            if m.group("mtm") else None
        out.append((m.group("dt"), dims, mtm, m.group("rest")))
    return out


_OPERAND_RE = re.compile(r"%([\w.\-]+)")

# the opcode's operand list: "opcode(%name..." or "opcode(TYPED_SHAPE %name"
# or an empty list "opcode()". Layout tiles like T(8,128)(2,1) also contain
# parens, so anchor on the opcode word + what an operand list can start with.
_OPLIST_RE = re.compile(
    r" [a-z][\w\-]*\((?=%|\)|(?:f32|bf16|f16|f64|s64|s32|s16|s8|u64|u32|u16|"
    r"u8|pred)\[)")


def _split_out_operands(rhs: str):
    """Split an instruction's RHS into (output-shape segment, operand
    segment). The RHS is `SHAPE opcode(operands...)` where SHAPE may be a
    tuple and layouts contain parens of their own."""
    m = _OPLIST_RE.search(rhs)
    if not m:
        return rhs, ""
    return rhs[:m.start()], rhs[m.end():]


def op_traffic_bytes(defline: str, name2line=None, _depth=0) -> int:
    """Output + operand physical bytes of one HLO instruction definition.

    The defline looks like:  %name = OUTSHAPE fusion(%op1, %op2, ...) ...
    Operands are usually referenced by name only; resolve each through
    `name2line` to its own output shape. Everything after `, kind=` /
    `, metadata=` is config, not operands.
    """
    body = defline.split(", kind=")[0].split(", metadata=")[0]
    body = body.split(", window=")[0].split(", dim_labels=")[0]
    lhs, _, rhs = body.partition(" = ")
    out_seg, op_seg = _split_out_operands(rhs)
    total = sum(physical_bytes(*s) for s in parse_shapes(out_seg))
    # operands: inline shapes if present, else resolve names (each unique
    # operand counted once — a buffer is read once per pass)
    inline = parse_shapes(op_seg)
    if inline:
        total += sum(physical_bytes(*s) for s in inline)
    elif name2line is not None and _depth < 2:
        seen = set()
        for m in _OPERAND_RE.finditer(op_seg):
            nm = m.group(1)
            if nm in seen:
                continue
            seen.add(nm)
            dl = name2line.get(nm)
            if dl is None:
                continue
            sub = dl.split(", kind=")[0].split(", metadata=")[0]
            # for an operand we want only its OUTPUT shape
            sub_out, _ = _split_out_operands(sub.partition(" = ")[2])
            shapes = parse_shapes(sub_out)
            if shapes:
                total += physical_bytes(*shapes[0]) if len(shapes) == 1 \
                    else sum(physical_bytes(*s) for s in shapes)
    return total


def load_deflines(hlo_path: str):
    """instruction name -> its full definition line (entry + fusions alike;
    only top-level instructions, i.e. ones that can carry trace durations,
    are wanted, but keeping everything is harmless since we join by name)."""
    name2line = {}
    for line in open(hlo_path):
        line = line.strip()
        m = re.match(r"(?:ROOT )?%([\w.\-]+) = ", line)
        if m:
            # first definition wins (entry computation comes first for ROOT
            # joins; duplicate names across fused computations are clones
            # with identical shapes)
            name2line.setdefault(m.group(1), line)
    return name2line


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hlo")
    ap.add_argument("trace_dir")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--filter", default="",
                    help="substring the op_name path must contain")
    ap.add_argument("--min-ms", type=float, default=0.02)
    args = ap.parse_args()

    name2path = load_op_paths(args.hlo)
    name2line = load_deflines(args.hlo)
    dur, _full = load_xla_op_durations(args.trace_dir, args.iters)

    rows = []
    for opn, d in dur.items():
        path = name2path.get(opn, "?")
        if args.filter and args.filter not in path:
            continue
        if d * 1e3 < args.min_ms:
            continue
        line = name2line.get(opn)
        if line is None:
            rows.append((d, path, None, None))
            continue
        nbytes = op_traffic_bytes(line, name2line)
        floor_ms = nbytes / (HBM_GBPS * 1e9) * 1e3
        rows.append((d, path, nbytes, floor_ms))

    rows.sort(reverse=True)
    print(f"{'ms':>8} {'GB':>7} {'GB/s':>6} {'floor':>7} {'x':>5}  op")
    tot_ms = tot_floor = 0.0
    for d, path, nbytes, floor_ms in rows:
        ms = d * 1e3
        tot_ms += ms
        if nbytes is None:
            print(f"{ms:8.3f} {'?':>7} {'?':>6} {'?':>7} {'?':>5}  {path[:80]}")
            continue
        tot_floor += floor_ms
        gb = nbytes / 1e9
        print(f"{ms:8.3f} {gb:7.3f} {gb / (d or 1e-12):6.0f} {floor_ms:7.3f} "
              f"{ms / floor_ms if floor_ms else float('inf'):5.2f}  {path[:80]}")
    print(f"\nTOTAL measured {tot_ms:.3f} ms vs layout-byte floor "
          f"{tot_floor:.3f} ms ({tot_ms / tot_floor if tot_floor else 0:.2f}x)")


if __name__ == "__main__":
    main()
