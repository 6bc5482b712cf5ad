"""Per-op / per-mode TPU wall-time attribution for the int8 net.

Usage (on the real TPU — do NOT set JAX_PLATFORMS):
    python tools/profile_tpu.py perop  [batch] [mode]   # per-op table
    python tools/profile_tpu.py modes  [batch]          # net-only, all modes
    python tools/profile_tpu.py trace  [batch] [mode]   # jax.profiler trace

The TPU-native analogue of the reference's static per-node MACC report
(`network_generate_report.txt:488-515`), measured dynamically.  `modes`
times the NET ONLY (no preprocess/decode) with in-jit repetition via
lax.fori_loop-free chaining: the whole net is jitted once and iterated with
a scalar fetch per step (tunnel-safe; see CLAUDE.md methodology notes).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np

TFLITE = "/root/reference/yoloface/tflite/yoloface_int8.tflite"


def make_input(batch):
    rng = np.random.default_rng(0)
    return rng.integers(-128, 128, (batch, 56, 56, 3)).astype(np.int8)


def net_ms(engine, x, iters=10):
    import jax

    x = jax.device_put(x)  # ONE host->device transfer (~60 MB/s tunnel)
    y = engine(x)
    np.asarray(y[0, 0, 0, 0])  # compile + real completion
    t0 = time.perf_counter()
    for _ in range(iters):
        y = engine(x)
    np.asarray(y[0, 0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.runtime.engine import Int8Engine
    from yoloface_tpu.runtime import profiler

    cmd = sys.argv[1] if len(sys.argv) > 1 else "modes"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    graph = load_tflite(TFLITE)

    # built on demand: the 448 commands never touch the 56px input, and
    # eagerly RNG-filling ~300 MB at the default batch costs real wall
    # time inside a bounded tunnel-evidence window
    _x = []

    def X():
        if not _x:
            _x.append(make_input(batch))
        return _x[0]

    if cmd == "perop":
        mode = sys.argv[3] if len(sys.argv) > 3 else "pallas"
        eng = Int8Engine(graph, mode=mode)
        rows = profiler.profile_engine(eng, X(), iters=20, warmup=2)
        print(profiler.format_profile(rows))
    elif cmd == "stages448":
        # integrated cumulative per-plan-stage timing of the 448 scale
        # family (tiled modes vs any other): jit plan[:k] with a scalar
        # reduce, report marginals — the attribution that drives the
        # tiled-section design (docs/PROFILE.md)
        import time

        import jax
        import jax.numpy as jnp

        from yoloface_tpu.graph.retarget import retarget_spatial

        mode = sys.argv[3] if len(sys.argv) > 3 else "pallas_tiled2"
        n = batch if batch <= 8192 else 1024
        g448 = retarget_spatial(graph, 8)
        eng = Int8Engine(g448, mode=mode)
        rng = np.random.default_rng(0)
        xi = rng.integers(-128, 128, (n, 448, 448, 3)).astype(np.int8)
        if mode.startswith("pallas"):
            xi = xi.transpose(eng._perm_in)
        xl = jax.device_put(jnp.asarray(xi))
        prev = 0.0
        for k in range(1, len(eng._plan) + 1):
            def run(xin, k=k):
                env = {eng.input_idx: xin}
                out = None
                for fn in eng._plan[:k]:
                    out = fn(env)
                return out.astype(jnp.int32).sum()

            f = jax.jit(run)
            int(f(xl))
            t0 = time.perf_counter()
            for _ in range(8):
                s = f(xl)
            int(s)
            ms = (time.perf_counter() - t0) / 8 * 1e3
            outs = getattr(eng._plan[k - 1], "stage_outputs",
                           [eng._plan[k - 1].out_idx])
            print(f"plan[:{k}]: {ms:8.2f} ms  (marginal "
                  f"{ms - prev:7.2f})  outs={outs}", flush=True)
            prev = ms
    elif cmd == "sweep448":
        # hybrid-routing sweep for the 448 scale family: time the full
        # retargeted net (engine __call__, NHWC in — honest serving
        # comparison) for XLA fast2, pure tiled, and candidate
        # YOLOFACE_TPU_TILE_XLA routings; print the winner so the best
        # split can be baked into DEFAULT_TILE_XLA (VERDICT r3 #2).
        from yoloface_tpu.graph.retarget import retarget_spatial

        import jax
        import jax.numpy as jnp

        n = batch if batch <= 8192 else 1024
        g448 = retarget_spatial(graph, 8)
        # generate ON DEVICE: pushing (n,448,448,3) int8 from the host
        # would cost ~10 s per routing over the ~60 MB/s tunnel
        # (net_ms's device_put is then a no-op)
        x448 = jax.jit(lambda: jax.random.randint(
            jax.random.key(0), (n, 448, 448, 3), -128, 128, jnp.int8))()
        np.asarray(x448[0, 0, 0, 0])      # force materialization
        routings = (sys.argv[3].split(";") if len(sys.argv) > 3 else
                    ["XLA", "none", "0", "3", "0,3", "0,1,3", "suffix",
                     "0,3,suffix", "0,1,3,suffix"])
        best = (None, float("inf"))
        for r in routings:
            try:
                if r == "XLA":
                    eng = Int8Engine(g448, mode="fast2")
                    label = "fast2 (stock XLA)"
                else:
                    _os.environ["YOLOFACE_TPU_TILE_XLA"] = r
                    try:
                        eng = Int8Engine(g448, mode="pallas_tiled2")
                    finally:
                        del _os.environ["YOLOFACE_TPU_TILE_XLA"]
                    label = f"tiled2 xla={r!r}"
                ms = net_ms(eng, x448, iters=5)
                print(f"{label:>28s}: {ms:8.2f} ms @ batch {n}"
                      f"  ({n / ms * 1e3:,.0f} fps)", flush=True)
                if ms < best[1]:
                    best = (r, ms)
            except Exception as e:  # noqa: BLE001 - sweep must finish
                print(f"{r:>28s}: FAILED {str(e).splitlines()[0][:120]}",
                      flush=True)
        if best[0] == "XLA":
            # stock XLA winning means EVERY section routes to the twin:
            # the bakeable DEFAULT_TILE_XLA value is the all-sections
            # string, NOT the literal 'XLA' (which would parse as a
            # nonexistent section name = pure tiled)
            from yoloface_tpu.kernels.pallas_tiled import plan_tiled_split
            secs, suffix = plan_tiled_split(g448)
            bake = ",".join([str(i) for i in range(len(secs))]
                            + (["suffix"] if suffix else []))
        else:
            bake = best[0]
        print(f"winner: {best[0]!r} at {best[1]:.2f} ms — bake "
              f"DEFAULT_TILE_XLA = {bake!r}", flush=True)
    elif cmd == "modes":
        modes = (sys.argv[3].split(",") if len(sys.argv) > 3 else
                 ["fast", "pallas", "pallas_fused"])
        for mode in modes:
            eng = Int8Engine(graph, mode=mode)
            print(f"{mode:>20s}: {net_ms(eng, X()):8.2f} ms @ batch {batch}",
                  flush=True)
    elif cmd == "net_cwhn":
        # net-only time EXCLUDING the NHWC->CWHN input relayout: feed the
        # plan a device-resident [C,W,H,N] tensor directly
        import jax
        import jax.numpy as jnp

        for mode in (sys.argv[3].split(",") if len(sys.argv) > 3
                     else ["pallas_arena"]):
            eng = Int8Engine(graph, mode=mode)
            xc = jax.device_put(np.ascontiguousarray(
                X().transpose(eng._perm_in)))

            def run_plan(xc, eng=eng):
                env = {eng.input_idx: xc}
                for fn in eng._plan:
                    env[fn.out_idx] = fn(env)
                return env[eng.output_idx]

            jfn = jax.jit(run_plan)
            y = jfn(xc)
            np.asarray(y[(0,) * y.ndim])
            t0 = time.perf_counter()
            for _ in range(10):
                y = jfn(xc)
            np.asarray(y[(0,) * y.ndim])
            ms = (time.perf_counter() - t0) / 10 * 1e3
            print(f"{mode:>20s} (cwhn, no transpose): {ms:8.2f} ms "
                  f"@ batch {batch}", flush=True)
    elif cmd == "transpose":
        import jax
        import jax.numpy as jnp
        xd = jax.device_put(X())
        jfn = jax.jit(lambda v: jnp.transpose(v, (3, 2, 1, 0)))
        y = jfn(xd)
        np.asarray(y[0, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(10):
            y = jfn(xd)
        np.asarray(y[0, 0, 0, 0])
        print(f"NHWC->CWHN transpose: "
              f"{(time.perf_counter() - t0) / 10 * 1e3:.2f} ms")
    elif cmd == "e2e":
        # pipeline-stage ablation: preprocess / net / decode / nms deltas
        import jax
        import jax.numpy as jnp
        from yoloface_tpu.pipeline.e2e import FacePipeline
        from yoloface_tpu.pipeline import head as head_lib
        from yoloface_tpu.pipeline import preprocess

        mode = sys.argv[3] if len(sys.argv) > 3 else "fast"
        eng = Int8Engine(graph, mode=mode)
        pipe = FacePipeline(eng)
        rng = np.random.default_rng(0)
        frames = jax.device_put(
            rng.integers(0, 1 << 16, (batch, 112, 112)).astype(np.uint16))

        def timed(name, fn, arg):
            jfn = jax.jit(fn)
            out = jfn(arg)
            leaf = jax.tree.leaves(out)[0]
            np.asarray(leaf[(0,) * leaf.ndim])
            t0 = time.perf_counter()
            for _ in range(10):
                out = jfn(arg)
            leaf = jax.tree.leaves(out)[0]
            np.asarray(leaf[(0,) * leaf.ndim])
            ms = (time.perf_counter() - t0) / 10 * 1e3
            print(f"{name:>28s}: {ms:8.2f} ms", flush=True)
            return ms

        timed("preprocess only", preprocess.rgb565_to_int8_input, frames)
        timed("preprocess+net", lambda f: eng._forward(
            preprocess.rgb565_to_int8_input(f)), frames)

        def through_decode(f):
            y = eng._forward(preprocess.rgb565_to_int8_input(f))
            boxes, conf, _ = head_lib.decode(
                y, scale=pipe._out_scale, zero_point=pipe._out_zp,
                cfg=pipe.head_config)
            return head_lib.clamp_boxes(boxes), conf

        timed("+decode", through_decode, frames)
        timed("full (+nms)", pipe._detect_from_rgb565, frames)
    elif cmd == "head":
        # decode / top_k / iou+greedy cost split at serving batch
        import jax
        import jax.numpy as jnp
        from yoloface_tpu.pipeline import head as head_lib

        cfg = head_lib.HeadConfig()
        rng = np.random.default_rng(0)
        y = jax.device_put(rng.integers(
            -128, 128, (batch, 7, 7, 18)).astype(np.int8))

        def timed(name, fn, *args):
            jfn = jax.jit(fn)
            out = jfn(*args)
            leaf = jax.tree.leaves(out)[0]
            np.asarray(leaf[(0,) * leaf.ndim])
            t0 = time.perf_counter()
            for _ in range(10):
                out = jfn(*args)
            leaf = jax.tree.leaves(out)[0]
            np.asarray(leaf[(0,) * leaf.ndim])
            ms = (time.perf_counter() - t0) / 10 * 1e3
            print(f"{name:>24s}: {ms:8.2f} ms", flush=True)

        def dec(y):
            b, c, _ = head_lib.decode(y, scale=0.142, zero_point=-15,
                                      cfg=cfg)
            return head_lib.clamp_boxes(b), c

        timed("decode", dec, y)

        def topk_only(y):
            boxes, conf = dec(y)
            scores = jnp.where(conf >= cfg.conf_threshold, conf, 0.0)
            s, idx = jax.lax.top_k(scores, cfg.max_detections)
            return s, jnp.take_along_axis(boxes, idx[..., None], axis=1)

        timed("decode+topk", topk_only, y)

        def full(y):
            boxes, conf = dec(y)
            return head_lib.select_detections(boxes, conf, cfg)

        timed("decode+topk+nms", full, y)
        timed("threshold-first head",
              lambda y: head_lib.detect_int8_head(
                  y, scale=0.142, zero_point=-15, cfg=cfg), y)
    elif cmd == "trace":
        import jax
        mode = sys.argv[3] if len(sys.argv) > 3 else "fast"
        eng = Int8Engine(graph, mode=mode)
        xt = X()
        y = eng(xt)
        np.asarray(y[0, 0, 0, 0])
        with profiler.trace(f"/tmp/trace_{mode}"):
            for _ in range(3):
                y = eng(xt)
            np.asarray(y[0, 0, 0, 0])
        print(f"trace written to /tmp/trace_{mode}")


if __name__ == "__main__":
    main()
