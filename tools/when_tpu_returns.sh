#!/bin/bash
# Unattended hardware-evidence chain for when the axon tunnel returns
# (ROADMAP "Blocked on the axon tunnel" order of operations).  Most
# valuable evidence first, so even a brief tunnel window lands something:
#   1. tpu_smoke      -> TPU_SMOKE.json (all-mode hardware bit-parity)
#   2. profile modes  -> exact-bits number + rsm A/B + strip sweeps
#   3. sweep448       -> hybrid-routing winner for the 448 race
#   4. bench.py       -> BENCH_r04 rehearsal
# Gates on the tunnel health endpoint BEFORE every step (the outage mode
# is a silent hang in backend init — without the gate each step would
# burn its whole timeout against a hung backend).  Logs append under a
# per-launch run id so a relaunch after a tunnel flap never clobbers
# previously captured evidence.
set -u
mkdir -p /tmp/tpu_evidence
cd "$(dirname "$0")/.."
RUN_ID=$(date +%m%d-%H%M%S)
HEALTH=http://127.0.0.1:8083/health
WAIT_S=${TPU_EVIDENCE_WAIT_S:-86400}     # how long to wait for the tunnel

wait_tunnel() {
    local t0=$SECONDS
    while ! curl -s -m 5 "$HEALTH" >/dev/null 2>&1; do
        if (( SECONDS - t0 > WAIT_S )); then
            echo "tunnel still down after ${WAIT_S}s — giving up" \
                | tee -a /tmp/tpu_evidence/driver.log
            exit 1
        fi
        sleep 30
    done
}

run() {  # run <tag> <timeout_s> <cmd...>
    local tag=$1 to=$2; shift 2
    wait_tunnel
    echo "=== [$RUN_ID] $tag: $* (timeout ${to}s) $(date)" \
        | tee -a /tmp/tpu_evidence/driver.log
    timeout "$to" "$@" >>"/tmp/tpu_evidence/$tag.$RUN_ID.log" 2>&1
    echo "=== [$RUN_ID] $tag rc=$? $(date)" \
        | tee -a /tmp/tpu_evidence/driver.log
}

run smoke        2400 python tools/tpu_smoke.py
run modes        1800 python tools/profile_tpu.py modes 32768 exact,fast,fast2,pallas_mxu2,pallas_mxu_exact
run modes_rsm0   900  env YOLOFACE_TPU_RSM=0 python tools/profile_tpu.py modes 32768 pallas_mxu_exact
run modes_live4  900  env YOLOFACE_TPU_EXACT_LIVE=4 python tools/profile_tpu.py modes 32768 pallas_mxu_exact
run modes_live3  900  env YOLOFACE_TPU_EXACT_LIVE=3 python tools/profile_tpu.py modes 32768 pallas_mxu_exact
run modes_strip32 900 env YOLOFACE_TPU_STRIP_TARGET=33554432 YOLOFACE_TPU_EXACT_LIVE=4 python tools/profile_tpu.py modes 32768 pallas_mxu_exact
run sweep448     3600 python tools/profile_tpu.py sweep448 1024
run bench        2400 python bench.py
run dw16         900  python tools/microbench.py dw16 32768
# pure-tiled knob probes at the winning-section shapes: lane-tile width,
# VMEM-target (fewer strips = less halo recompute), chunk size
run sweep448_nt64   1200 env YOLOFACE_TPU_TILE_NT=64 python tools/profile_tpu.py sweep448 1024 'none'
run sweep448_vm128  1200 env YOLOFACE_TPU_TILE_VMEM=134217728 python tools/profile_tpu.py sweep448 1024 'none'
run sweep448_ck32   1200 env YOLOFACE_TPU_TILE_CHUNK=33554432 python tools/profile_tpu.py sweep448 1024 'none'
echo "ALL DONE [$RUN_ID] $(date)" | tee -a /tmp/tpu_evidence/driver.log
