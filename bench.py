"""Benchmark: all-vs-all Forward scoring throughput on the example
workload (the reference's dominant cost: 141 HMMs x 500 queries of
`hmmsearch --max`, witch_msa/gcmm/algorithm.py:524-537; measured CPU
baseline on this machine: 236.2 CPU-seconds of hmmsearch, i.e. 59.05 s
on the 4 cores = 1194 pairs/s).

Prints ONE JSON line. The eHMM bank + encoded queries are loaded from
the committed bench_assets.npz (regenerate with
scripts/make_bench_assets.py) so setup is under a second; compiled
kernels persist in .jax_cache. Timing uses np.asarray of a device
scalar so the (slow) device->host tunnel is excluded and the device is
truly synchronized (block_until_ready is async-unsafe on this platform).

Tier order:
  1. resident daemon (owns the accelerator session; fresh-process
     probes serialize behind it) — submits a {"kind": "bench"} job;
  2. fresh-process TPU tier (probe + watchdog);
  3. native-CPU tier (the production CPU path's full-grid Forward).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_PAIRS_PER_S = 70500 / (236.2 / 4)


def log(msg):
    print("[bench %6.1fs] %s" % (time.time() - T0, msg), file=sys.stderr,
          flush=True)


T0 = time.time()


def emit(dt, padded_cells, total_pairs, true_cells, on_tpu):
    """Compute the secondary domaindef metric and print the JSON line."""
    # secondary metric: the native domaindef engine (reporting gate +
    # exact null2 + f64 Forward) on one model vs 100 queries — the
    # per-candidate gate cost behind the Forward pre-ranker.
    extra = {}
    try:
        sys.path.insert(0, os.path.join(HERE, "scripts"))
        from make_bench_assets import load_banks, load_profile0

        from witch_tpu.native import _domaindef
        _, z = load_banks(os.path.join(HERE, "bench_assets.npz"))
        codes, lens = z["codes"], z["lens"]
        prof = load_profile0(os.path.join(HERE, "bench_assets.npz"))
        args = [np.ascontiguousarray(prof.msc, np.float64)] + [
            np.ascontiguousarray(getattr(prof, a), np.float64)
            for a in ("t_mm", "t_mi", "t_md", "t_im", "t_ii",
                      "t_dm", "t_dd", "bm")]
        clist = [np.ascontiguousarray(codes[i, :lens[i]], np.int32)
                 for i in range(min(len(lens), 100))]
        t0 = time.time()
        _domaindef.evaluate_targets(*args, clist, 42, 200, 1, 4)
        dd = time.time() - t0
        extra["domaindef_pairs_per_s_4t"] = round(len(clist) / dd, 1)
        log("domaindef: %d pairs in %.2fs" % (len(clist), dd))
    except Exception as e:   # noqa: BLE001
        log("domaindef metric skipped: %s" % e)

    pairs_per_s = total_pairs / dt
    print(json.dumps({
        "metric": "forward_scoring_pairs_per_s",
        "value": round(pairs_per_s, 1),
        "unit": "query-HMM pairs/s (141-HMM eHMM x 500 queries, 1 chip)",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 2),
        "gcups_true": round(true_cells / dt / 1e9, 2),
        "gcups_padded": round(padded_cells / dt / 1e9, 2),
        "seconds_per_full_grid": round(dt, 3),
        "backend": "pallas-tpu" if on_tpu else "native-cpu",
        **extra,
    }), flush=True)


def try_daemon_tier():
    """If a resident witch-tpu daemon is alive, it owns the accelerator
    session — fresh-process probes serialize behind it on the remote
    server and can stall for minutes. Ask the daemon to time the grid
    in-process instead (same benchlib.tpu_tier code, warm programs).
    Returns the tier dict or None."""
    if os.environ.get("WITCH_TPU_PLATFORM"):
        return None                      # explicit platform: honor it
    try:
        from witch_tpu import server as wserver
        jd = wserver.default_jobs_dir()
        if not wserver.server_alive(jd, fresh_s=30.0):
            return None
        log("live daemon found; submitting bench job to it")
        budget = float(os.environ.get("WITCH_TPU_BENCH_BUDGET", "360"))
        res = wserver.submit(
            jd, [], timeout_s=budget, dead_server_s=120.0,
            extra={"kind": "bench",
                   "assets": os.path.join(HERE, "bench_assets.npz")})
        out = res.get("output") if res.get("ok") else None
        if out and out.get("backend") == "tpu":
            log("daemon bench ok (warm call %.1fs, grid %.3fs)"
                % (out.get("warm_s", -1), out["dt"]))
            return out
        log("daemon bench unusable (%s); falling through"
            % (res.get("error") or "backend=%s" % (out or {}).get("backend")))
    except Exception as e:   # noqa: BLE001
        log("daemon bench unavailable (%s); falling through" % e)
    return None


def run_cpu_tier():
    # CPU fallback: the production CPU path Forward-ranks the full
    # grid with the native engine (pipeline.py native_prescore via
    # _domaindef.forward_targets), then gate-evaluates only
    # weight-rank candidates. Times the FULL 141-model grid (no
    # sampling/extrapolation; ~4.5 s on 4 AVX-512 cores).
    from concurrent.futures import ThreadPoolExecutor

    from make_bench_assets import load_banks, load_profile_row

    from witch_tpu.native import _domaindef
    banks, z = load_banks(os.path.join(HERE, "bench_assets.npz"))
    codes, lens = z["codes"], z["lens"]
    Q = len(lens)
    clist = [np.ascontiguousarray(codes[i, :lens[i]], np.int32)
             for i in range(Q)]
    rows_all = [(bi, r) for bi, b in enumerate(banks)
                for r in range(b.H)]
    profs = [load_profile_row(banks[bi], r) for bi, r in rows_all]

    def margs(p):
        return [np.ascontiguousarray(p.msc, np.float64)] + [
            np.ascontiguousarray(getattr(p, a), np.float64)
            for a in ("t_mm", "t_mi", "t_md", "t_im", "t_ii",
                      "t_dm", "t_dd", "bm")]

    fwd_fn = getattr(_domaindef, "forward_targets_simd",
                     _domaindef.forward_targets)
    log("timing native Forward on the full %d-model x %d-query grid"
        % (len(profs), Q))
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(
            lambda p: fwd_fn(*margs(p), clist, 1),
            profs))
    dt = time.time() - t0
    true_cells = int(lens.sum()) * int(z["true_states"])
    total_pairs = Q * sum(b.H for b in banks)
    return dt, true_cells, total_pairs, true_cells  # no padding on native


def main():
    sys.path.insert(0, HERE)
    sys.path.insert(0, os.path.join(HERE, "scripts"))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(HERE, ".jax_cache"))

    daemon_out = try_daemon_tier()
    if daemon_out is not None:
        emit(daemon_out["dt"], daemon_out["padded_cells"],
             daemon_out["total_pairs"], daemon_out["true_cells"],
             on_tpu=True)
        return

    # device health probe in a subprocess: a dead remote-TPU tunnel
    # reports devices but fails at remote_compile, which would kill the
    # bench before it prints its JSON line. Fall back to CPU instead.
    # Retried with backoff: the tunnel occasionally refuses the first
    # connection after idle, then recovers (observed rounds 1-2, where
    # a single-shot probe cost the driver capture its TPU number).
    probe_ok = False
    if not os.environ.get("WITCH_TPU_PLATFORM"):
        for attempt in range(3):
            try:
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import jax, numpy\n"
                     "x = jax.numpy.zeros(8) + 1\n"
                     "assert float(numpy.asarray(x).sum()) == 8.0\n"],
                    capture_output=True, text=True, timeout=150)
                probe_ok = r.returncode == 0
            except Exception:
                probe_ok = False
            if probe_ok:
                break
            log("accelerator probe attempt %d failed; retrying"
                % (attempt + 1))
            time.sleep(5 * (attempt + 1))
    import jax
    if os.environ.get("WITCH_TPU_PLATFORM"):
        jax.config.update("jax_platforms",
                          os.environ["WITCH_TPU_PLATFORM"])
    elif not probe_ok:
        jax.config.update("jax_platforms", "cpu")
        log("accelerator probe failed; benching on CPU fallback")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(HERE, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # Watchdog: the remote-TPU server intermittently takes minutes
        # per program load (observed 150-500 s after idle/eviction, vs
        # ~4 s warm). If the TPU tier outlives its budget, abandon the
        # process-shared device state entirely by finishing the run in
        # a CPU-tier subprocess — the driver must always get its JSON.
        budget = float(os.environ.get("WITCH_TPU_BENCH_BUDGET", "360"))
        import threading
        result = {}

        def tpu_work():
            try:
                from witch_tpu.benchlib import tpu_tier
                log("compiling/warming the canonical scoring programs...")
                result["v"] = tpu_tier(os.path.join(HERE,
                                                    "bench_assets.npz"))
            except Exception as e:   # noqa: BLE001
                result["err"] = e

        th = threading.Thread(target=tpu_work, daemon=True)
        th.start()
        th.join(budget)
        if "v" in result:
            out = result["v"]
            log("warm in %.1fs; timed" % out["warm_s"])
            emit(out["dt"], out["padded_cells"], out["total_pairs"],
                 out["true_cells"], on_tpu=True)
            return
        why = ("timed out after %.0fs" % budget if th.is_alive()
               else "failed (%s)" % type(result["err"]).__name__)
        log("TPU tier %s; finishing on the CPU tier in a clean "
            "subprocess" % why)
        env = dict(os.environ, WITCH_TPU_PLATFORM="cpu")
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, timeout=1200, text=True,
                           capture_output=True)
        sys.stderr.write(r.stderr[-2000:])
        line = [x for x in r.stdout.splitlines()
                if x.startswith("{")]
        if r.returncode == 0 and line:
            print(line[-1], flush=True)
            # hard-exit: the abandoned TPU thread may be wedged
            # inside the remote runtime and would block interpreter
            # teardown
            os._exit(0)
        raise SystemExit("bench CPU-tier subprocess failed (rc=%d)"
                         % r.returncode)

    dt, padded_cells, total_pairs, true_cells = run_cpu_tier()
    emit(dt, padded_cells, total_pairs, true_cells, on_tpu=False)


if __name__ == "__main__":
    main()
