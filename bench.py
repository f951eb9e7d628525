"""Benchmark: full 21cm cube synthesis (flagship config Nside=512 × 256 freq).

Steady-state timed step (all on device, dense ops only — safe on the axon
backend): correlated a_lm draw (complex normals × per-ell covariance roots,
MXU einsum) → cached-Λ Legendre contraction (MXU einsums) → foldless
Bluestein ring synthesis (matmul FFTs) → dense ring-grid maps → in-graph
scalar reduction.  Setup (host, one-time): channel-integrated C_l table via
the sinc²-window DCT method and batched per-ell matrix roots.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): < 5 s on one v5e chip.
"""

import argparse
import json
import sys
import time

_T0 = time.time()  # process-start anchor for the cold-to-first-map wall

import numpy as np
import jax
import jax.numpy as jnp


LADDER = [
    # (nside, nfreq, fchunk, fleg, lchunk, subprocess timeout s) — largest
    # first; the orchestrator emits the JSON line of the largest config that
    # completes (the axon TPU service can fail transiently; see tools/).
    # 512 config tuned on v5e: 0.76 s (sweeps in tools/tpu_*.log).
    (512, 256, 4, 128, 256, 1700),
    (256, 64, 32, 64, 64, 700),
    (128, 32, 16, 32, 64, 600),
    (64, 32, 16, 32, 64, 500),
]


def orchestrate():
    """Run the ladder in worker subprocesses; print the first JSON result."""
    import subprocess

    for nside, nfreq, fchunk, fleg, lchunk, tmo in LADDER:
        cmd = [
            sys.executable, __file__,
            "--nside", str(nside), "--nfreq", str(nfreq),
            "--fchunk", str(fchunk), "--fleg", str(fleg),
            "--lchunk", str(lchunk), "--repeats", "2",
        ]
        print(f"# trying Nside={nside} x {nfreq} (timeout {tmo}s)",
              file=sys.stderr)
        try:
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=tmo)
        except subprocess.TimeoutExpired:
            print(f"# Nside={nside}: timeout", file=sys.stderr)
            continue
        sys.stderr.write(r.stderr)
        line = next(
            (ln for ln in r.stdout.splitlines() if ln.startswith("{")), None
        )
        if r.returncode == 0 and line:
            print(line)
            return
        print(f"# Nside={nside}: exit={r.returncode}", file=sys.stderr)
    print(json.dumps({
        "metric": "full 21cm cube synth", "value": -1.0, "unit": "s",
        "vs_baseline": 0.0,
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nside", type=int, default=None)
    p.add_argument("--nfreq", type=int, default=256)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--fchunk", type=int, default=32)
    p.add_argument("--fleg", type=int, default=None,
                   help="frequencies per Legendre-stage chunk (default nfreq)")
    p.add_argument("--lchunk", type=int, default=64)
    p.add_argument("--capsub", type=int, default=None,
                   help="frequency sub-batch for the cap Bluestein conv")
    p.add_argument("--legmode", default="cached", choices=["cached", "scan"],
                   help="Legendre stage: cached MXU table or Λ-free "
                        "checkpointed scan (enables Nside >= 1024)")
    p.add_argument("--ckevery", type=int, default=1,
                   help="scan mode: re-seed every k-th ell chunk "
                        "(table 1/k the size)")
    p.add_argument("--xi", default="f32", choices=["f32", "bf16"],
                   help="white-noise draw dtype. bf16 halves the RNG bits "
                        "and is chi^2-valid (tests/test_skysim.py), but "
                        "measured NO step win in the fused program on v5e "
                        "(0.587 vs 0.581 s) — isolated-probe gain "
                        "(tools/tpu_rng.py) does not survive in context")
    p.add_argument("--prec", default="highest",
                   choices=["default", "high", "highest"],
                   help="matmul precision for the transform contractions "
                        "(high = 3-pass bf16, ~2x MXU throughput; accuracy "
                        "ladder in tools/tpu_prec.py)")
    p.add_argument("--lambuild", default="device", choices=["host", "device"],
                   help="cached-Λ table build: 'device' materialises the "
                        "chunks on the TPU via the scaled+checkpointed "
                        "recurrence (seconds; ~1e-6 map RMS class), 'host' "
                        "runs the exact f64 host build + multi-GB transfer "
                        "(minutes; ~2e-7)")
    p.add_argument("--sims", type=int, default=1,
                   help="batched realisations per step (vmap over keys): "
                        "the covariance roots and Λ table are read once "
                        "per sweep for B cubes of work (reference DP "
                        "analogue: lss.py num_sims)")
    p.add_argument("--roofline", action="store_true",
                   help="also time draw/legendre/ring stages separately "
                        "and report minimum HBM bytes + achieved GB/s")
    p.add_argument("--cmul", default=None, choices=["xla", "karatsuba"],
                   help="complex-matmul lowering for the ring-FFT stages "
                        "(default: karatsuba on accelerators — 7.5%% "
                        "full-step win at identical accuracy, "
                        "tools/cmul_compare.py; xla on CPU)")
    p.add_argument("--setup", default=None, choices=["host", "device"],
                   help="C_l/covariance-roots setup path: 'device' builds "
                        "the DCT tables, C_l grid and batched-eigh roots "
                        "as jitted device programs from a ~100 kB "
                        "spline-knot upload (default on accelerators); "
                        "'host' is the f64 host build + 403 MB roots "
                        "transfer (with a .bench_cache disk tier)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args()

    if args.nside is None:
        orchestrate()
        return

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # persistent compilation cache: the warmup compile of the flagship
    # program is expensive on this backend; cache hits skip it entirely
    try:
        import os as _os

        cache_dir = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                  ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:
        print(f"# compilation cache unavailable: {e}", file=sys.stderr)

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    # Start the backend session init NOW.  On the axon-tunnelled runtime
    # the first *executed* program pays a one-time session flush (~72 s
    # warm service, ~306 s cold — tools/coldstart_r4b*.out) that proceeds
    # SERVER-side once dispatched (tools/flush_overlap.out: a 75 s host
    # sleep hid it completely).  Dispatching a trivial program here makes
    # every second of host-side setup below overlap it; the un-hidden
    # remainder is measured and reported as setup.backend_init_s.
    t_flush0 = time.time()
    _flush = jax.jit(lambda x: x + 1.0)(jnp.zeros(8, jnp.float32))

    from cora_tpu.signal.corr21cm import Corr21cm
    from cora_tpu.signal import clfast
    from cora_tpu.healpix.sht import SHT, synthesis_scan_correlated
    from cora_tpu.util import xfer

    nside, nfreq = args.nside, args.nfreq
    lmax = 3 * nside - 1
    L = lmax + 1
    freqs = np.linspace(400.0, 800.0, nfreq, endpoint=False)

    # ---------------- host setup (one-time, like building model weights);
    # pure functions of (nside, nfreq) — cached on disk next to the script
    import os

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    roots_path = os.path.join(cache_dir, f"roots_{nside}_{nfreq}.npy")

    setup = {}
    setup_mode = args.setup or ("host" if dev.platform == "cpu" else "device")
    t0 = time.time()
    roots_d = None
    if setup_mode == "device":
        # zero-transfer setup: spline knots up (~100 kB), then DCT tables,
        # C_l grid and batched-eigh roots as device programs — dispatched
        # NOW (async), executing server-side behind the session flush while
        # the host builds the SHT tables below.  Accuracy vs the host f64
        # build: tables ~1e-6, ||R Rᵀ − C|| ~1e-6 relative
        # (tests/test_skysim.py::test_device_cl_setup).
        model = Corr21cm()
        t_m = time.time()
        td = clfast.build_cl_tables_device(model, freqs)
        t_b = time.time()
        roots_d = clfast.cl_roots_device(td, lmax)
        print(f"# roots dispatch detail: model {t_m-t0:.1f}s, tables "
              f"{t_b-t_m:.1f}s, cl+eigh {time.time()-t_b:.1f}s",
              file=sys.stderr)
        # drop the host references to the DCT-table device buffers: the
        # runtime keeps them alive for the queued roots program; holding
        # them here would pin ~200 MB of HBM through the whole run
        del td
        setup["roots_dispatch_s"] = round(time.time() - t0, 1)
        print(f"# device C_l/roots programs dispatched "
              f"({setup['roots_dispatch_s']}s)", file=sys.stderr)
    elif os.path.exists(roots_path):
        roots = np.load(roots_path)
        print(f"# covariance roots: loaded cache ({time.time()-t0:.1f}s)",
              file=sys.stderr)
    else:
        model = Corr21cm()
        tables = clfast.build_cl_tables(model, freqs, dtype=np.float64)
        cla = clfast.cl_grid_np(tables, lmax)
        print(f"# C_l table setup: {time.time()-t0:.1f}s", file=sys.stderr)

        t0 = time.time()
        # per-ell covariance roots on host (batched eigh with clipping)
        dmax = np.abs(np.diagonal(cla, axis1=1, axis2=2)).max(axis=1)
        cla_n = cla / dmax[:, None, None]
        cla_n += np.eye(nfreq) * 1e-12
        evals, evecs = np.linalg.eigh(cla_n)
        evals = np.where(
            evals > evals.max(axis=1, keepdims=True) * 1e-16, evals, 0.0
        )
        roots = (evecs * np.sqrt(evals)[:, None, :]) * np.sqrt(dmax)[:, None, None]
        roots = roots.astype(np.float32)  # [L, nz, nz]
        np.save(roots_path, roots)
        print(f"# covariance roots (host eigh): {time.time()-t0:.1f}s",
              file=sys.stderr)
    if setup_mode != "device":
        setup["roots_s"] = round(time.time() - t0, 1)

    # karatsuba wins 7.5% at 256×64 (fchunk=32) but loses ~1% at the
    # flagship's thin fchunk=4 ring batches (same-process head-to-heads,
    # tools/cmul_compare_{256,512}.out) — batch-width-dependent default
    cmul = args.cmul or (
        "xla" if (dev.platform == "cpu" or args.nside > 256) else "karatsuba"
    )
    t0 = time.time()
    op = SHT(nside, lmax, legendre_mode=args.legmode, fft_mode="mm",
             l_chunk=args.lchunk, cap_sub=args.capsub, precision=args.prec,
             fft_cmul=cmul,
             scan_ckpt=args.legmode == "scan", ckpt_every=args.ckevery,
             lambda_build=args.lambuild,
             ckpt_cache=os.path.join(
                 cache_dir, f"ck_{nside}_{args.lchunk}_{args.ckevery}.npz"),
             lambda_cache=os.path.join(
                 cache_dir, f"lam_{nside}_{args.lchunk}.npz"))
    sht_tables = xfer.put_tree(op.tables(False))
    if roots_d is None:
        roots_d = xfer.put(roots)
    setup["sht_dispatch_s"] = round(time.time() - t0, 1)
    print(f"# SHT tables built+dispatched: {setup['sht_dispatch_s']}s",
          file=sys.stderr)

    fchunk = min(args.fchunk, nfreq)
    # default Legendre-stage width: all frequencies when the working set
    # fits HBM (nside <= 256), else 2×fchunk (fleg=64 fits at 512 on 16 GB
    # since the triangle draw; fleg=128 exceeds HBM by ~0.25 GB)
    fleg_default = nfreq if nside <= 256 else 2 * fchunk
    fleg = min(args.fleg or fleg_default, nfreq)
    fleg = max(fleg - fleg % fchunk, fchunk)
    while nfreq % fleg:
        fleg -= fchunk

    # timed step: ONE jitted program — two-level streamed synthesis
    # (Legendre stage at fleg frequencies for full MXU row tiles and
    # one-shot RNG; ring FFT stage at fchunk to bound HBM), accumulated to
    # a scalar on device.  The full alm cube never materialises in HBM.
    xi_dtype = jnp.bfloat16 if args.xi == "bf16" else jnp.float32

    def _one(key, r, t):
        return synthesis_scan_correlated(
            op, t, r, key, fleg, fchunk,
            lambda g, z, acc: acc + jnp.sum(jnp.abs(g)), jnp.float32(0.0),
            xi_dtype=xi_dtype,
        )

    if args.sims > 1:
        # batched throughput mode: vmap over keys — XLA batches the draw
        # and Legendre matmuls, so roots/Λ stream from HBM once per sweep
        # for `sims` cubes of MXU work (the reference's num_sims DP loop,
        # lss.py:394, as one device program)
        step_fn = jax.jit(jax.vmap(_one, in_axes=(0, None, None)))

        def bench_key(i):
            base = jax.random.key(i, impl="rbg")
            return jax.random.split(base, args.sims)
    else:
        step_fn = jax.jit(_one)

        def bench_key(i):
            return jax.random.key(i, impl="rbg")

    # rbg PRNG (bench_key): XLA's hardware RngBitGenerator — ~10x faster
    # normals than threefry on TPU (the draw is RNG-bound at flagship size)

    # --- AOT executable cache -------------------------------------------
    # The flagship-step compile costs ~620 s on the axon backend and the
    # jax persistent compile cache does NOT restore it across processes
    # there (BASELINE.md round 3); PJRT executable serialization DOES
    # (deserialize+load < 0.1 s, identical results), so the compiled step
    # is cached in .bench_cache keyed by config + versions + device kind.
    import pickle

    kind_tag = dev.device_kind.replace(" ", "")
    exe_path = os.path.join(
        cache_dir,
        f"exe_{nside}_{nfreq}_{fchunk}_{fleg}_{args.lchunk}_{args.legmode}"
        f"_{args.xi}_{args.prec}_{args.sims}_{jax.__version__}_{kind_tag}"
        f"{'' if cmul == 'xla' else '_' + cmul}.pkl",
    )
    # XLA:CPU executables do not survive deserialization (execution fails
    # with "Buffer Definition Event not found"); the TPU path round-trips
    # cleanly — gate the cache to accelerators, where it matters.
    use_exe_cache = dev.platform != "cpu"

    def _compile_and_save():
        t0 = time.time()
        c = step_fn.lower(bench_key(0), roots_d, sht_tables).compile()
        setup["compile_s"] = round(time.time() - t0, 1)
        print(f"# step compile: {setup['compile_s']}s", file=sys.stderr)
        if use_exe_cache:
            try:
                from jax.experimental.serialize_executable import serialize

                with open(exe_path, "wb") as fh:
                    pickle.dump(serialize(c), fh)
            except Exception as e:  # pragma: no cover
                print(f"# AOT executable save failed: {e}", file=sys.stderr)
        return c

    compiled = None
    from_cache = False
    if use_exe_cache and os.path.exists(exe_path):
        t0 = time.time()
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load,
            )

            with open(exe_path, "rb") as fh:
                compiled = deserialize_and_load(*pickle.load(fh))
            from_cache = True
            setup["exe_load_s"] = round(time.time() - t0, 1)
            print(f"# AOT executable: cache hit ({setup['exe_load_s']}s)",
                  file=sys.stderr)
        except Exception as e:  # version skew etc. — recompile
            print(f"# AOT executable load failed: {e}", file=sys.stderr)
            compiled = None

    # Drain the queued device work NOW, one stage at a time, each pinned
    # by a tiny D2H probe fetch.  block_until_ready does NOT synchronize
    # on the axon runtime (tools/device_setup_attrib*.py: 3.2 GB of
    # tables report "ready" in 0.0 s and the whole queue then lands on
    # the first step — BENCH_r03's 311 s "warmup"), and serialized stage
    # execution is also measurably faster end-to-end than letting the
    # queue drain under the first step (~295 s vs 443-683 s total in the
    # round-4 attribution runs).
    #
    # backend_init_s is ENVIRONMENTAL: the first executed program pays a
    # one-time server session flush whose duration is set by the service's
    # state, not by this process — measured 52-119 s on a warm service
    # (tools/flush_overlap.out, coldstart_r4b_warm.out), 306-880 s on a
    # cold one (coldstart_r4b.out; BENCH_r04's 802.6 s un-hidden was an
    # ~880 s cold-service flush of which the ~80 s of host setup above hid
    # only a tenth — the "0.0 s un-hidden" overlap result holds only when
    # host setup >= flush, i.e. on a warm service).  Everything the
    # process controls (table builds, exe deserialize, dispatches) is
    # already overlapped ahead of this point.
    t0 = time.time()
    _flush.block_until_ready()
    _ = float(jnp.abs(_flush).sum())
    setup["backend_init_s"] = round(time.time() - t0, 1)
    setup["backend_init_total_s"] = round(time.time() - t_flush0, 1)
    print(f"# backend session init: {setup['backend_init_s']}s un-hidden "
          f"({setup['backend_init_total_s']}s total since dispatch)",
          file=sys.stderr)

    t0 = time.time()
    _ = float(jnp.sum(jnp.abs(
        roots_d[:: max(1, roots_d.shape[0] // 8), 0, 0]
    )))
    dt = time.time() - t0
    setup["roots_s"] = round(
        setup.get("roots_dispatch_s", setup.get("roots_s", 0.0)) + dt, 1
    )
    print(f"# covariance roots executed (+{dt:.1f}s)", file=sys.stderr)

    t0 = time.time()
    _leaves = jax.tree_util.tree_leaves(sht_tables)

    @jax.jit
    def _probe_leaves(ls):
        return sum(
            jnp.sum(jnp.abs(l.ravel()[:: max(1, l.size // 64)])).astype(
                jnp.float32
            )
            for l in ls
        )

    _ = float(_probe_leaves(_leaves))
    dt = time.time() - t0
    setup["sht_s"] = round(setup["sht_dispatch_s"] + dt, 1)
    print(f"# SHT tables resident (+{dt:.1f}s)", file=sys.stderr)

    if compiled is None:
        compiled = _compile_and_save()

    def step(key):
        out = compiled(key, roots_d, sht_tables)
        return float(out.sum()) if args.sims > 1 else float(out)

    t0 = time.time()
    try:
        s = step(bench_key(0))
    except Exception as e:
        if not from_cache:
            raise
        # stale cached executable (runtime/driver skew): recompile once
        print(f"# cached executable failed at run time: {e}", file=sys.stderr)
        compiled = _compile_and_save()
        t0 = time.time()
        s = step(bench_key(0))
    setup["warmup_s"] = round(time.time() - t0, 1)
    print(f"# warmup (first step): {setup['warmup_s']}s sum={s:.3e}",
          file=sys.stderr)

    # headline setup metric: wall from process start to the first
    # completed map cube.  cold_wall_s = the part this process controls
    # (everything except the environmental backend session flush).
    setup["total_s"] = round(time.time() - _T0, 1)
    setup["cold_wall_s"] = round(
        setup["total_s"] - setup.get("backend_init_s", 0.0), 1
    )
    print(f"# cold-to-first-map: {setup['total_s']}s total "
          f"({setup['cold_wall_s']}s excluding the backend session "
          f"flush)", file=sys.stderr)

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        step(bench_key(i + 1))
        times.append(time.time() - t0)
    best = min(times)
    print(f"# times: {['%.2f' % t for t in times]}", file=sys.stderr)
    if args.sims > 1:
        print(f"# {args.sims} sims/step -> {best/args.sims:.3f} s/cube, "
              f"{args.sims/best:.2f} cubes/s", file=sys.stderr)

    # --- per-stage roofline (VERDICT r2 item 5) -------------------------
    # Times cumulative programs (draw; draw+legendre; full step) and
    # reports per-stage time by subtraction, minimum HBM bytes
    # (_stage_bytes) and achieved GB/s.  Subtraction is approximate when
    # XLA overlaps stages — overlap makes the full step FASTER than the
    # sum, so per-stage GB/s here are conservative.
    stages = None
    if args.roofline and args.legmode == "cached" and args.sims == 1:
        from jax import lax
        from cora_tpu.healpix.sht import (
            _make_split_draw_blk, _correlated_GeGo,
        )

        L_ = lmax + 1
        ne = (L_ + 1) // 2
        meta = op._lam_meta
        roots_p = jnp.concatenate([roots_d[0::2], roots_d[1::2]], axis=0)

        @jax.jit
        def draw_only(key, r, t):
            def sweep(i, acc):
                blk = _make_split_draw_blk(
                    r, key, i * fleg, fleg, nfreq, xi_dtype
                )
                for c, (parity, sub_lo, nrows, _) in enumerate(meta):
                    mw = min(t["lam"][c].shape[0], L_)
                    off = sub_lo + (0 if parity == 0 else ne)
                    acc = acc + jnp.sum(jnp.abs(blk(c, off, nrows, mw)))
                return acc
            return lax.fori_loop(0, nfreq // fleg, sweep, jnp.float32(0.0))

        @jax.jit
        def draw_leg(key, r, t):
            def sweep(i, acc):
                Ge, Go = _correlated_GeGo(
                    op, t, r, key, i * fleg, fleg, xi_dtype
                )
                return acc + jnp.sum(jnp.abs(Ge)) + jnp.sum(jnp.abs(Go))
            return lax.fori_loop(0, nfreq // fleg, sweep, jnp.float32(0.0))

        def _time(fn):
            fn(bench_key(0), roots_p, sht_tables).block_until_ready()
            ts = []
            for i in range(2):
                t0 = time.time()
                fn(bench_key(i + 1), roots_p, sht_tables).block_until_ready()
                ts.append(time.time() - t0)
            return min(ts)

        t_draw = _time(draw_only)
        t_dl = _time(draw_leg)
        t_leg = max(t_dl - t_draw, 1e-4)
        t_ring = max(best - t_dl, 1e-4)
        parts = _analytic_parts(op, nfreq, fleg)
        sbytes = _stage_bytes(op, sht_tables, nfreq, fleg, fchunk)
        stages = {}
        for name, ts in [("draw", t_draw), ("legendre", t_leg),
                         ("ring", t_ring)]:
            stages[name] = {
                "s": round(ts, 3),
                "gbytes_min": round(sbytes[name] / 1e9, 2),
                "gbps": round(sbytes[name] / 1e9 / ts, 1),
                "tflops": round(parts[name] / ts / 1e12, 2),
            }
        print(f"# roofline: {stages}", file=sys.stderr)

    # --- FLOP accounting → MFU (VERDICT r1 item 10) ---------------------
    # Prefer XLA's own count of the compiled program; fall back to the
    # analytic per-stage count (draw einsum + Legendre einsums + Bluestein
    # matmul-FFT stages) if cost_analysis is unavailable on this backend.
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)
    if not flops:
        flops = _analytic_flops(op, nfreq, fleg) * args.sims
        src = "analytic"
    else:
        src = "xla"

    kind = jax.devices()[0].device_kind
    peaks = {  # dense bf16 peak FLOP/s per chip
        "TPU v5e": 197e12, "TPU v5 lite": 197e12, "TPU v5 litepod": 197e12,
        "TPU v4": 275e12, "TPU v5p": 459e12, "TPU v6e": 918e12,
        "TPU v6 lite": 918e12,
    }
    peak = next((v for k, v in peaks.items() if k.lower() in kind.lower()),
                197e12 if "tpu" in kind.lower() else None)
    tflops = flops / best / 1e12
    per_cube = best / args.sims
    out = {
        "metric": f"full 21cm cube synth (Nside={nside} x {nfreq} freq)",
        "value": round(per_cube, 3),
        "unit": "s",
        "vs_baseline": round(5.0 / per_cube, 3),
        "tflops": round(tflops, 3),
        "flops": int(flops),
        "flops_source": src,
        "setup": setup,
    }
    if args.sims > 1:
        out["sims"] = args.sims
        out["cubes_per_s"] = round(args.sims / best, 3)
    if stages is not None:
        out["stages"] = stages
        hbm_peaks = {  # GB/s per chip
            "TPU v5e": 819.0, "TPU v5 lite": 819.0, "TPU v4": 1228.0,
            "TPU v5p": 2765.0, "TPU v6e": 1640.0, "TPU v6 lite": 1640.0,
        }
        hbm = next(
            (v for k, v in hbm_peaks.items() if k.lower() in kind.lower()),
            None,
        )
        if hbm:
            out["hbm_peak_gbps"] = hbm
    if peak:
        # NOTE precision="highest" f32 einsums run ~3 bf16 MXU passes per
        # logical MAC on TPU, so the hardware does ~3x `flops`; mfu here
        # is logical-work utilisation against the bf16 peak (the honest,
        # comparable-with-other-frameworks definition)
        out["mfu"] = round(flops / best / peak, 4)
        out["device_kind"] = kind
    print(json.dumps(out))


def _analytic_parts(op, nfreq, fleg):
    """Per-stage logical real-FLOP count of one full-cube step.

    Convention: one real multiply-add = 2 flops; real λ × complex a_lm
    MAC = 4; complex × complex MAC = 8.
    """
    L = op.lmax + 1
    nh = op.nhalf
    nz = nfreq
    lc = op.l_chunk
    nchunk = -(-L // lc)
    draw = leg = 0.0
    for c in range(nchunk):
        mw = min(L, ((min(L, (c + 1) * lc) + 127) // 128) * 128)
        # draw: roots[lc, fleg, nz](c64) x xi[lc, nz, mw](c64)
        draw += 8.0 * lc * fleg * nz * mw
        # legendre: lam[lc, nh, mw](f32) x alm[fleg, lc, mw](c64)
        leg += 4.0 * lc * nh * fleg * mw
    sweeps = nz / fleg
    # ring stage: per frequency, 2 matmul-FFT applications (fwd+inv) at
    # nfft2, each ~2 matmuls of [nring, n1, n2]-ish cost 8*nring*nfft2*
    # (n1+n2) complex flops (fftmm factorization), plus the W-length
    # equatorial FFTs — approximate with the dominant nfft2 pair
    n1, n2 = op._fft2_n1n2
    nring = 4 * op.nside - 1
    ring = 2 * 8.0 * nring * op.nfft2 * (n1 + n2) * nz
    return {"draw": draw * sweeps, "legendre": leg * sweeps, "ring": ring}


def _analytic_flops(op, nfreq, fleg):
    return sum(_analytic_parts(op, nfreq, fleg).values())


def _stage_bytes(op, t, nfreq, fleg, fchunk):
    """Minimum HBM traffic per stage of one full-cube step (bytes).

    Counts unavoidable reads/writes of tensors that cannot stay on-core:
    the ξ white-noise blocks (written by the RNG, read by the draw
    einsum), the covariance-root slices, the per-chunk alm blocks
    (written by the draw, read by the Legendre einsum), the Λ table
    (read once per sweep), the H0/H1 ring accumulators (read+write of
    the chunk's m-window per chunk) and the ring stage's spectrum/grid
    passes (G write+read, ~4 Bluestein passes over the nfft2 spectrum,
    grid write).  Fusion can only reduce these numbers; the achieved
    GB/s computed against them is therefore a LOWER bound.
    """
    L = op.lmax + 1
    nh = op.nhalf
    nz = nfreq
    sweeps = nz / fleg
    xi = alm = lam = acc = 0.0
    for c, (parity, sub_lo, nrows, _) in enumerate(op._lam_meta):
        mw = min(t["lam"][c].shape[0], L)
        xi += nrows * nz * 2 * mw * 4 * 2        # write + read, f32
        alm += fleg * 2 * nrows * mw * 4 * 2     # write + read
        lam += t["lam"][c].nbytes                # read
        acc += 2 * fleg * 2 * nh * mw * 4 * 2    # H0+H1 slice r+w
    roots = L * fleg * nz * 4
    draw = (xi + roots + alm / 2) * sweeps
    leg = (lam + alm / 2 + acc) * sweeps
    nring = 4 * op.nside - 1
    nq = 4 * op.nside
    ring = (
        nring * L * 8 * 2            # G spectrum write + read (c64)
        + 4 * nring * op.nfft2 * 8   # ~4 Bluestein passes over nfft2
        + nring * nq * 4             # grid write (f32)
    ) * nz
    return {"draw": draw, "legendre": leg, "ring": ring}


if __name__ == "__main__":
    main()
