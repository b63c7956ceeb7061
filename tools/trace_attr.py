"""Attribute an xplane TPU trace to model modules via HLO op_name metadata.

The profiling recipe behind every kernel/layout decision in this repo
(.claude/skills/verify/SKILL.md): capture a trace around N steady-state steps
plus the compiled HLO text, then attribute per-op device time to model modules
using the HLO's `metadata={op_name="jit(...)/<module path>"}`.

Rules (learned in round 1, BASELINE.md):
- read ONLY the line named exactly 'XLA Ops' ('Async XLA Ops' double-counts
  overlapped DMA);
- per-op durations include scheduling stalls — only end-to-end numbers are
  decision-grade; the attribution tells you WHERE to look, not the exact win.

Usage:
  python tools/trace_attr.py <hlo.txt> <trace_dir> [--iters N] [--depth D]

Capture example:
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    open("/tmp/hlo.txt", "w").write(fwd.lower(variables, x).compile().as_text())
    jax.profiler.start_trace("/tmp/trace")
    for _ in range(4): out = fwd(variables, x)
    float(jnp.ravel(out)[0])          # drain (block_until_ready no-ops on axon)
    jax.profiler.stop_trace()
"""

import argparse
import collections
import glob
import re
import sys


def load_op_paths(hlo_path: str):
    """HLO instruction name -> op_name metadata path (module path)."""
    hlo = open(hlo_path).read()
    name2path = {}
    for m in re.finditer(
            r'%([\w.\-]+) = .*?metadata=\{op_name="jit\([^)]*\)/([^"]*)"', hlo):
        name2path[m.group(1)] = m.group(2)
    return name2path


def load_xla_op_durations(trace_dir: str, iters: int):
    """op name -> seconds/iter from the newest vm.xplane.pb under trace_dir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb"))
    if not files:
        raise SystemExit(f"no .xplane.pb under {trace_dir}/plugins/profile/")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())
    dur = collections.Counter()
    full = {}
    for plane in xs.planes:
        if "TPU" not in plane.name or plane.name.endswith("pjrt"):
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                n = ev_names.get(ev.metadata_id, "?")
                opn = n.split(" = ")[0].lstrip("%")
                dur[opn] += ev.duration_ps / 1e12 / iters
                full[opn] = n
    return dur, full


def module_of(path: str, depth: int) -> str:
    """First `depth` components of the op_name path, dropping transform frames."""
    parts = [p for p in path.split("/")
             if p and not p.startswith(("jit(", "jvp(", "transpose("))]
    return "/".join(parts[:depth]) if parts else "(unattributed)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hlo")
    ap.add_argument("trace_dir")
    ap.add_argument("--iters", type=int, default=4,
                    help="steps captured in the trace (divide durations)")
    ap.add_argument("--depth", type=int, default=2,
                    help="module-path depth for the rollup")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    name2path = load_op_paths(args.hlo)
    dur, full = load_xla_op_durations(args.trace_dir, args.iters)

    total = sum(dur.values())
    print(f"total XLA-Ops device time: {total * 1e3:.2f} ms/iter "
          f"({len(dur)} ops)\n")

    rollup = collections.Counter()
    for opn, d in dur.items():
        rollup[module_of(name2path.get(opn, "?"), args.depth)] += d
    print(f"== module rollup (depth {args.depth}) ==")
    for mod, d in rollup.most_common():
        print(f"  {d * 1e3:8.3f} ms  {100 * d / total:5.1f}%  {mod}")

    print(f"\n== top {args.top} ops ==")
    for opn, d in dur.most_common(args.top):
        path = name2path.get(opn, "?")
        print(f"  {d * 1e3:7.3f} ms  {path[:70]:70s} {full[opn][:100]}")


if __name__ == "__main__":
    main()
