#!/bin/bash
# One-session perf run: every committed bench script, sequentially, on the
# real TPU (ONE process at a time — CLAUDE.md). Appends each script's JSON
# line (tagged) to benchmarks/RESULTS.jsonl — the single source of truth the
# README/PARITY perf tables are regenerated from (VERDICT r3 item 1).
#
# Usage: bash benchmarks/run_all.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/RESULTS.jsonl}"
: > "$OUT"

run() { # run <tag> <cmd...>
  local tag="$1"; shift
  echo "=== $tag: $*" >&2
  local line
  line=$("$@" 2> >(grep -v WARNING >&2) | tail -1)
  if [ -n "$line" ]; then
    printf '{"bench": "%s", "result": %s}\n' "$tag" "$line" >> "$OUT"
  else
    printf '{"bench": "%s", "result": null}\n' "$tag" >> "$OUT"
  fi
}

run driver              timeout 1800 python bench.py
run kernel_fwd_bwd_32k  timeout 1200 python benchmarks/kernel_bench.py --bwd
run gla_32k             timeout 1200 python benchmarks/gla_bench.py --op gla --bwd
run delta_32k           timeout 1200 python benchmarks/gla_bench.py --op delta --bwd
run decode_b1           timeout 1200 python benchmarks/decode_bench.py --batch 1
run decode_b8           timeout 1200 python benchmarks/decode_bench.py --batch 8
run train_ctx2048       timeout 1200 python benchmarks/train_bench.py --batch 4 --seq 2048
run train_ctx32k        timeout 1800 python benchmarks/train_bench.py --batch 1 --seq 32768
run train_mamba2        timeout 1800 python benchmarks/train_bench.py --batch 4 --seq 2048 --attn mamba2
run wan_fp32            timeout 3000 python benchmarks/wan_bench.py --modes hybrid,softmax,mhla
run wan_bf16            timeout 3000 python benchmarks/wan_bench.py --modes hybrid,softmax,mhla --bf16_attn
run wan_layer_fp32      timeout 1800 python benchmarks/wan_bench.py --layer
run wan_layer_bf16      timeout 1800 python benchmarks/wan_bench.py --layer --bf16_attn
run wan_layer_bwd_bf16  timeout 2400 python benchmarks/wan_bench.py --layer --bwd --bf16_attn
echo "=== done -> $OUT" >&2
cat "$OUT"
