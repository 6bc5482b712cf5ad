#!/bin/bash
# Unattended hardware-evidence chain for when the axon tunnel returns
# (ROADMAP "Blocked on the axon tunnel" order of operations).  Most
# valuable evidence first, so even a brief tunnel window lands something:
#   1. tpu_smoke      -> TPU_SMOKE.json (all-mode hardware bit-parity)
#   2. profile modes  -> exact-bits number + rsm A/B + strip sweeps
#   3. sweep448       -> hybrid-routing winner for the 448 race
#   4. bench.py       -> BENCH_r04 rehearsal
# Each step logs to /tmp/tpu_evidence/ and a failed step does not stop
# the rest (the tunnel may flap — capture what we can).
set -u
mkdir -p /tmp/tpu_evidence
cd "$(dirname "$0")/.."

run() {  # run <tag> <timeout_s> <cmd...>
    local tag=$1 to=$2; shift 2
    echo "=== $tag: $* (timeout ${to}s) $(date)" | tee -a /tmp/tpu_evidence/driver.log
    timeout "$to" "$@" >"/tmp/tpu_evidence/$tag.log" 2>&1
    echo "=== $tag rc=$? $(date)" | tee -a /tmp/tpu_evidence/driver.log
}

run smoke        2400 python tools/tpu_smoke.py
run modes        1800 python tools/profile_tpu.py modes 32768 exact,fast,fast2,pallas_mxu2,pallas_mxu_exact
run modes_rsm0   900  env YOLOFACE_TPU_RSM=0 python tools/profile_tpu.py modes 32768 pallas_mxu_exact
run modes_live4  900  env YOLOFACE_TPU_EXACT_LIVE=4 python tools/profile_tpu.py modes 32768 pallas_mxu_exact
run modes_live3  900  env YOLOFACE_TPU_EXACT_LIVE=3 python tools/profile_tpu.py modes 32768 pallas_mxu_exact
run modes_strip32 900 env YOLOFACE_TPU_STRIP_TARGET=33554432 YOLOFACE_TPU_EXACT_LIVE=4 python tools/profile_tpu.py modes 32768 pallas_mxu_exact
run sweep448     3600 python tools/profile_tpu.py sweep448 1024
run bench        2400 python bench.py
echo "ALL DONE $(date)" | tee -a /tmp/tpu_evidence/driver.log
