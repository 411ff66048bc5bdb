#!/usr/bin/env python3
"""Driver-visible bench artifact for the non-headline models/modes.

BENCH_r*.json (the driver's bench.py run) captures ViT-B probing only;
the ViT-L/H and finetune claims lived in PERFORMANCE.md prose (r4 VERDICT
Weak #6). This wrapper runs bench.py in subprocesses with the documented
env knobs and writes ONE json with every row, so those numbers are
reproducible from artifacts alone:

    python scripts/bench_models.py [--out BENCH_MODELS_r05.json]
                                   [--rows vit_l,vit_h,ft_b,ft_h]

Each row is bench.py's own JSON line (including the ViT-H compile-lottery
rolls). Compiles amortize through .aot_cache/ — a warm tree re-runs in
minutes; a fresh git HEAD pays one full compile per row (budget ~10-20
min/row cold through the relay).

One TPU job at a time (CLAUDE.md): rows run strictly sequentially.
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = {
    # probing, non-headline models (headline ViT-B is BENCH_r*.json itself)
    "vit_l": {"EP_TPU_BENCH_MODEL": "vit_large_patch16"},
    "vit_h": {"EP_TPU_BENCH_MODEL": "vit_huge_patch14"},
    # full fine-tuning (--finetuning): ViT-B bs512, ViT-H bs128 (bs256
    # OOMs on LARS f32 state, PERFORMANCE.md "Full fine-tuning mode")
    "ft_b": {"EP_TPU_BENCH_FINETUNE": "1"},
    # ViT-L finetune at bs256: remat-saved activations scale with B*D*depth
    # (~10 GB at bs512 with attn_out policy) — bs256 leaves headroom for
    # the f32 master+momentum LARS state (2.4 GB)
    "ft_l": {"EP_TPU_BENCH_FINETUNE": "1",
             "EP_TPU_BENCH_MODEL": "vit_large_patch16",
             "EP_TPU_BENCH_BATCH": "256"},
    "ft_h": {"EP_TPU_BENCH_FINETUNE": "1",
             "EP_TPU_BENCH_MODEL": "vit_huge_patch14",
             "EP_TPU_BENCH_BATCH": "128",
             "EP_TPU_BENCH_MU_BF16": "1"},
}
# secondaries (cached-mode / int8 / device-aug) only matter on the
# headline ViT-B row; skip them here to bound the wall clock
COMMON = {"EP_TPU_BENCH_SKIP_CACHED": "1", "EP_TPU_BENCH_DEVICE_AUG": "0"}


def run_row(name, env_delta, timeout_s):
    env = dict(os.environ)
    env.update(COMMON)
    env.update(env_delta)
    t0 = time.time()
    print(f"[bench-models] {name}: {env_delta} ...", file=sys.stderr,
          flush=True)
    p = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                       capture_output=True, text=True, env=env,
                       timeout=timeout_s, cwd=ROOT)
    line = ""
    for ln in p.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            line = ln
    if p.returncode != 0 or not line:
        print(f"[bench-models] {name} FAILED rc={p.returncode}\n"
              f"{p.stderr[-2000:]}", file=sys.stderr, flush=True)
        return {"error": f"rc={p.returncode}", "stderr_tail": p.stderr[-500:]}
    row = json.loads(line)
    row["env"] = env_delta
    row["wall_s"] = round(time.time() - t0, 1)
    print(f"[bench-models] {name}: {row['value']} img/s "
          f"({row['wall_s']}s)", file=sys.stderr, flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default=",".join(ROWS))
    ap.add_argument("--out", default="BENCH_MODELS_r05.json")
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-row timeout (cold ViT-H compiles are slow)")
    args = ap.parse_args()

    doc = {"note": ("bench.py rows under documented env knobs "
                    "(scripts/bench_models.py); headline ViT-B probing is "
                    "the driver's own BENCH_r*.json"),
           "rows": {}}
    # partial re-runs (--rows ft_h) merge into an existing artifact
    # instead of clobbering the rows they didn't measure
    out_path = os.path.join(ROOT, args.out)
    if os.path.exists(out_path):
        with open(out_path) as f:
            doc["rows"] = json.load(f).get("rows", {})
    for name in args.rows.split(","):
        doc["rows"][name] = run_row(name, ROWS[name], args.timeout)
        with open(os.path.join(ROOT, args.out), "w") as f:
            json.dump(doc, f, indent=1)  # checkpoint after every row
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
