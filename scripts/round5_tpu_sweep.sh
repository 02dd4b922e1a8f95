#!/bin/bash
# Round-5 hardware measurement sweep — ONE command that captures every
# pending TPU measurement when the axon tunnel is reachable (it was down
# for most of round 5). Each stage streams partial results and has its own
# deadline, so a tunnel flap mid-sweep still leaves artifacts.
#
# Usage: bash scripts/round5_tpu_sweep.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-benchmarks/r5_sweep}
mkdir -p "$OUT"
log() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$OUT/sweep.log"; }

log "0. tunnel probe"
if ! timeout 240 python -c "import jax; print(jax.devices())" >> "$OUT/sweep.log" 2>&1; then
  log "tunnel unreachable — aborting sweep"; exit 1
fi

log "1. train 16k (recalibrates the 9012 baseline; wall + pipelined device rate)"
timeout 1800 python bench.py --mode train --seq-len 16384 --steps 6 --warmup 2 \
  --deadline 1500 2>"$OUT/train16k.err" | tee "$OUT/train16k.jsonl"

log "2. decode 64 slots x 256 gen (target >= 4000 tok/s e2e; was 2252)"
timeout 1800 python bench.py --mode decode --batch-size 64 --gen-tokens 256 \
  --deadline 1500 2>"$OUT/decode.err" | tee "$OUT/decode.jsonl"

log "2b. decode mixed lengths (tail/refill under continuous batching)"
timeout 1200 python bench.py --mode decode --batch-size 64 --gen-tokens 256 \
  --mixed-lengths --deadline 900 2>"$OUT/decode_mixed.err" | tee "$OUT/decode_mixed.jsonl"

log "3. on-TPU learning gate (reward must RISE through the TPU compute path)"
timeout 3000 python scripts/northstar_learning.py \
  --out "$OUT/NORTHSTAR_LEARN_r05.json" 2>&1 | tail -20 | tee -a "$OUT/sweep.log"

log "4. 64k remat frontier table (full vs save_attn/K vs offload_attn/K)"
for mode in full save_attn/7 save_attn/4 offload_attn/7; do
  tag=$(echo "$mode" | tr '/' '_')
  log "   64k ac.mode=$mode"
  timeout 1800 python bench.py --mode train --seq-len 65536 --steps 3 --warmup 1 \
    --remat "$mode" --optimizer adamw_8bit --master-dtype bfloat16 \
    --micro-batch-rows 1 --dispatch-micro-batches --deadline 1500 \
    2>"$OUT/64k_$tag.err" | tee "$OUT/64k_$tag.jsonl"
done

log "5. int8-compute A/B at 16k"
timeout 1500 python bench.py --mode train --seq-len 16384 --steps 4 --warmup 2 \
  --quantized-compute int8 --deadline 1200 2>"$OUT/int8.err" | tee "$OUT/int8.jsonl"

log "6. north-star async-RL e2e (target <= 4.5 s/step after the decode cuts)"
rm -rf outputs/northstar
timeout 3000 python -m prime_rl_tpu.entrypoints.rl \
  @configs/bench/northstar_rl_tpu.toml --colocated > "$OUT/northstar.log" 2>&1
python - "$OUT" <<'EOF'
import json, sys, numpy as np, pathlib
out = pathlib.Path(sys.argv[1])
try:
    rows = [json.loads(l) for l in open("outputs/northstar/trainer.jsonl")]
    steps = [r for r in rows if "step_time_s" in r]
    waits = [r["wait_for_batch_s"] for r in steps]
    tot = [r["step_time_s"] + r["wait_for_batch_s"] + r.get("publish_s", 0) for r in steps]
    med = float(np.median(tot))
    art = {"workload": "northstar-async-rl-e2e-r5", "steps": len(steps),
           "sec_per_step_median": round(med, 2),
           "env_steps_per_sec": round(64 / med, 1) if med else None,
           "wait_for_batch_median": round(float(np.median(waits)), 2),
           "train_step_median": round(float(np.median([r["step_time_s"] for r in steps])), 2)}
    (out / "NORTHSTAR_r05.json").write_text(json.dumps(art, indent=1))
    print(json.dumps(art))
except Exception as e:
    print("northstar parse failed:", e)
EOF
log "sweep done — artifacts in $OUT"
