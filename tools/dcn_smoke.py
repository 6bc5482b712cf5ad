"""Two-process multi-host (DCN) smoke: the design in docs/MULTICHIP.md,
actually executed.

Spawns two OS processes, each with 4 virtual CPU devices, joined through
``mesh.init_distributed`` with a localhost coordinator — the same entry
point a real multi-host TPU pod would use (one process per host; there the
gradient all-reduce rides DCN, here gloo over localhost).  Each process:

  1. builds the global 8-device mesh spanning both processes;
  2. assembles its OWN half of a global frame batch with
     ``global_batch_from_host_local`` (the multi-host camera-streams
     analogue of the reference's per-MCU capture loop, main.c:42-54);
  3. runs one sharded int8 inference step and checks its addressable
     output shards bit-exactly against a single-device run of the same
     global batch;
  4. runs one sharded train step (params replicated, batch sharded, ICI/
     DCN all-reduce inserted by XLA) and checks the loss is finite and
     identical across processes.

Parent mode (no --process-id) spawns the children, aggregates their JSON
reports, asserts agreement, and writes MULTIHOST_SMOKE.json.

Usage:  python tools/dcn_smoke.py            # parent: spawn + verify
        python tools/dcn_smoke.py --process-id 0 --port 12421   # child
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"
N_PROC = 2
LOCAL_DEVICES = 4
GLOBAL_BATCH = 8


def child(process_id: int, port: int) -> None:
    # env (XLA_FLAGS, JAX_PLATFORMS) is prepared by the parent before
    # the interpreter starts; axon pins the platform via jax.config
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from yoloface_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.init_distributed(f"localhost:{port}",
                                     num_processes=N_PROC,
                                     process_id=process_id)
    assert jax.process_count() == N_PROC
    assert jax.local_device_count() == LOCAL_DEVICES
    assert mesh.devices.size == N_PROC * LOCAL_DEVICES

    # establish the gloo collectives context NOW, while both processes
    # are idle: on this one-core machine the first heavy jit compile can
    # skew the processes by minutes, and gloo context initialization has
    # a fixed 30 s rendezvous deadline — a trivial barrier up front makes
    # the context creation immune to the later compile skew
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("dcn_smoke_start")

    # ---- sharded inference, checked vs single-device ----
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.pipeline.e2e import FacePipeline
    from yoloface_tpu.runtime.engine import Int8Engine

    graph = load_tflite(TFLITE)
    pipe = FacePipeline(Int8Engine(graph, mode="fast"))

    # the full global batch is derived from a shared seed so every process
    # can also compute the single-device reference locally
    rng = np.random.default_rng(7)
    global_x = rng.integers(-128, 128, (GLOBAL_BATCH, 56, 56, 3),
                            dtype=np.int64).astype(np.int8)
    per = GLOBAL_BATCH // N_PROC
    local_x = global_x[process_id * per:(process_id + 1) * per]

    sharded = pipe.make_sharded(mesh, "int8")
    got = sharded(mesh_lib.global_batch_from_host_local(local_x, mesh))
    want = pipe.detect_int8(global_x)          # single-device, local

    checks = {}
    for k in ("boxes", "scores", "valid", "count"):
        for shard in got[k].addressable_shards:
            lo = shard.index[0].start or 0
            w = np.asarray(want[k])[shard.index]
            np.testing.assert_array_equal(np.asarray(shard.data), w,
                                          err_msg=f"{k}@{lo}")
        checks[k] = True

    # ---- sharded training step over the global mesh ----
    from yoloface_tpu.train.steps import (TrainConfig, init_state,
                                          make_sharded_train_step)

    cfg = TrainConfig(batch_size=GLOBAL_BATCH, steps_per_epoch=1, epochs=1)
    state = init_state(jax.random.PRNGKey(0), cfg)
    state = mesh_lib.replicate(state, mesh)
    step = make_sharded_train_step(cfg, mesh)

    rng2 = np.random.default_rng(11)
    g_images = rng2.uniform(0, 1, (GLOBAL_BATCH, 56, 56, 3)).astype(
        np.float32)
    g_targets = np.zeros((GLOBAL_BATCH, 3, 7, 7, 6), np.float32)
    g_targets[:, 1, 3, 3] = [0.5, 0.5, 0.1, 0.1, 1.0, 1.0]
    images = mesh_lib.global_batch_from_host_local(
        g_images[process_id * per:(process_id + 1) * per], mesh)
    targets = mesh_lib.global_batch_from_host_local(
        g_targets[process_id * per:(process_id + 1) * per], mesh)
    state, metrics = step(state, images, targets)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)

    print(json.dumps({"process_id": process_id,
                      "process_count": jax.process_count(),
                      "global_devices": int(mesh.devices.size),
                      "inference_bit_exact": checks,
                      "train_loss": loss}), flush=True)


def parent() -> int:
    import socket

    with socket.socket() as s:               # free localhost port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count="
                        f"{LOCAL_DEVICES}").strip()
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--process-id", str(i), "--port", str(port)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for i in range(N_PROC)]
    reports = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        if p.returncode != 0:
            sys.stderr.write(err[-4000:])
            raise SystemExit(f"child failed rc={p.returncode}")
        reports.append(json.loads(out.strip().splitlines()[-1]))

    losses = {r["train_loss"] for r in reports}
    assert len(losses) == 1, f"loss differs across processes: {losses}"
    assert all(all(r["inference_bit_exact"].values()) for r in reports)
    result = {"ok": True, "processes": N_PROC,
              "devices_per_process": LOCAL_DEVICES,
              "global_devices": reports[0]["global_devices"],
              "train_loss": reports[0]["train_loss"],
              "inference_bit_exact": True}
    with open(os.path.join(REPO, "MULTIHOST_SMOKE.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--port", type=int, default=12421)
    args = ap.parse_args()
    if args.process_id is None:
        return parent()
    child(args.process_id, args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
