#!/bin/bash
# Sequential TPU validation queue — one process at a time (concurrent TPU
# processes fault the device). Each step logs to /tmp/q_<name>.log and is
# skipped if its log already ends in DONE (resumable after device faults).
cd /root/repo

run_step() {
  name=$1; shift
  log=/tmp/q_${name}.log
  if [ -f "$log" ] && tail -1 "$log" | grep -q "^QUEUE_STEP_DONE"; then
    echo "skip $name (done)"; return 0
  fi
  echo "=== $name: $(date +%H:%M:%S) ==="
  timeout "$1" "${@:2}" > "$log" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then echo "QUEUE_STEP_DONE" >> "$log"; fi
  echo "=== $name exit $rc ==="
  sleep 10
}

queue_pass() {
  # 1. quick device sanity + canonical overfit drive (verify)
  run_step drive_overfit 900 python tools/drive_overfit.py

  # 2. tracer quality audit at the new tiled defaults (exact-oracle bias)
  run_step audit 3600 python tools/audit_train_budget.py

  # 3. chained component/config profile at eval budgets
  run_step prof_eval 3600 python tools/_prof_eval_tracer.py

  # 4. headline bench
  run_step bench 1800 python bench.py

  # 5. stage-1 per-phase bench
  run_step bench_stage1 2400 python tools/bench_stage1.py

  # 6. on-device Pallas vs XLA raster parity (VERDICT r2 weak #7)
  run_step raster_parity 1200 python tools/check_raster_parity.py

  # 7. one 800^2 NVS frame end-to-end at reference eval sample counts
  run_step bench_frame 3600 python tools/bench_frame.py

  # 8. shadow-scene oracle parity + Mrays/s at the new tiled eval defaults
  #    (results cached per block in /tmp/jax_tool_cache-adjacent npy files,
  #    so re-runs after faults resume)
  run_step drive_parity 7200 python tools/drive_parity.py
}

# up to 3 passes: a device fault mid-queue marks steps un-DONE; later
# passes retry only those (5 min recovery idle between passes)
for pass in 1 2 3; do
  echo "=== QUEUE PASS $pass $(date +%H:%M:%S) ==="
  queue_pass
  all_done=1
  for s in drive_overfit audit prof_eval bench bench_stage1 raster_parity bench_frame drive_parity; do
    tail -1 /tmp/q_${s}.log 2>/dev/null | grep -q "^QUEUE_STEP_DONE" || all_done=0
  done
  [ $all_done -eq 1 ] && break
  sleep 300
done

echo "ALL QUEUE STEPS ATTEMPTED $(date +%H:%M:%S)"
