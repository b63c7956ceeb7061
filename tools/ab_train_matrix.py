"""Train-step A/B matrix (VERDICT r3 item 3): the round-3 inference defaults
(dmaj attention layout, chunked-GELU fc2, fused MSDA prep) also execute in
the training graph, but every round-3 A/B row was a tile-forward measurement.
This runs `tools/bench_train_step.py` under each knob setting in its own
subprocess (same hygiene as tools/ab_matrix.py: a Mosaic failure or wedged
relay cannot contaminate the next row) and writes the JSON artifact.

Usage:
    python tools/ab_train_matrix.py [--model dinounet_s] [--batch 2]
        [--out .bench_logs/ab_train_r4.json] [--rows a,b,...]
"""

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# knob rows: HEAD defaults vs each round-3 default flipped back individually
MATRIX = {
    "head":        {},
    "ndh":         {"DINOUNET_TPU_ATTN_LAYOUT": "ndh"},
    "gelu-kernel": {"DINOUNET_TPU_MLP_GELU": "kernel"},
    "prep-xla":    {"DINOUNET_TPU_MSDA_PREP": "xla"},
    "head-2":      {},
}


def measure(knobs: dict, model: str, batch: int, timeout_s: int):
    env = dict(os.environ)
    env.update(knobs)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_train_step.py"),
             model, str(batch)],
            env=env, capture_output=True, text=True, timeout=timeout_s,
            cwd=REPO)
    except subprocess.TimeoutExpired:
        return None, None, f"timeout after {timeout_s}s"
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                res = json.loads(line)
            except json.JSONDecodeError:
                continue
            return float(res["value"]), res.get("first_step_s"), None
    return None, None, f"no result (rc={proc.returncode}): " + \
        (proc.stderr.strip().splitlines()[-1][:300] if proc.stderr else "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dinounet_s")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--out", default=".bench_logs/ab_train_r4.json")
    ap.add_argument("--rows", default=None)
    ap.add_argument("--timeout", type=int, default=2700)
    args = ap.parse_args()

    matrix = MATRIX
    if args.rows:
        keep = {r.strip() for r in args.rows.split(",")}
        matrix = {k: v for k, v in matrix.items() if k in keep}

    rows = []
    for name, knobs in matrix.items():
        print(f"=== {name}: {knobs} ===", flush=True)
        ms, first_s, err = measure(knobs, args.model, args.batch, args.timeout)
        row = {"name": name, "knobs": knobs, "model": args.model,
               "batch": args.batch}
        if ms is None:
            row["error"] = err
            print(f"  FAILED: {err}", flush=True)
        else:
            row["ms_per_iter"] = ms
            row["first_step_s"] = first_s
            print(f"  {ms:.1f} ms/iter (first step {first_s}s)", flush=True)
        rows.append(row)

    out = {"model": args.model, "batch": args.batch,
           "timestamp": datetime.datetime.now().isoformat(), "rows": rows}
    os.makedirs(os.path.dirname(os.path.join(REPO, args.out)), exist_ok=True)
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
