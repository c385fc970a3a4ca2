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
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def log(msg):
    print("[bench %6.1fs] %s" % (time.time() - T0, msg), file=sys.stderr,
          flush=True)


T0 = time.time()


def main():
    sys.path.insert(0, HERE)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(HERE, ".jax_cache"))
    # device health probe in a subprocess: a dead remote-TPU tunnel
    # reports devices but fails at remote_compile, which would kill the
    # bench before it prints its JSON line. Fall back to CPU instead.
    # Retried with backoff: the tunnel occasionally refuses the first
    # connection after idle, then recovers (observed rounds 1-2, where
    # a single-shot probe cost the driver capture its TPU number).
    import subprocess
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
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(HERE, "scripts"))
    from make_bench_assets import load_banks

    banks, z = load_banks(os.path.join(HERE, "bench_assets.npz"))
    codes, lens = z["codes"], z["lens"]
    true_states = int(z["true_states"])
    Q = len(lens)
    H = sum(b.H for b in banks)
    total_pairs = Q * H
    true_cells = int(lens.sum()) * true_states
    log("assets loaded: %d HMMs in %d banks, %d queries" %
        (H, len(banks), Q))

    QT = 128

    def run_tpu_tier():
        # the pipeline's exact single-program call (canonical_pad +
        # unified bank): benching it here leaves the ONE production
        # scoring program warm on the accelerator server for the
        # pipeline/daemon, and vice versa
        from witch_tpu.ops.pallas_forward import (bank_to_pallas_arrays,
                                                  canonical_pad,
                                                  effective_n_dbl,
                                                  pallas_forward_nats)
        Qpad, Lpad = canonical_pad(Q, int(lens.max()), QT)
        cp = np.full((Qpad, Lpad), 4, np.int32)
        for qi in range(Q):
            cp[qi, :lens[qi]] = codes[qi, :lens[qi]]
        lp = np.ones(Qpad, np.int32)
        lp[:Q] = lens
        devbanks = []
        padded = 0
        for b in banks:
            emT, trans = bank_to_pallas_arrays(b)
            devbanks.append((jnp.asarray(emT), jnp.asarray(trans),
                             effective_n_dbl(trans)))
            padded += Qpad * Lpad * emT.shape[2] * b.H
        cpj, lpj = jnp.asarray(cp), jnp.asarray(lp)

        def run():
            tot = jnp.zeros((), jnp.float32)
            for emTj, transj, ndbl in devbanks:
                tot = tot + pallas_forward_nats(
                    emTj, transj, cpj, lpj, QT=QT, n_dbl=ndbl).sum()
            return tot

        log("compiling/warming (%d program(s), Qpad=%d Lpad=%d)..."
            % (len(devbanks), Qpad, Lpad))
        _ = float(np.asarray(run()))
        log("warm; timing")
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            _ = float(np.asarray(run()))
        return (time.time() - t0) / reps, padded

    def run_cpu_tier():
        # CPU fallback: the production CPU path Forward-ranks the full
        # grid with the native engine (pipeline.py native_prescore via
        # _domaindef.forward_targets), then gate-evaluates only
        # weight-rank candidates. Times the FULL 141-model grid (no
        # sampling/extrapolation; ~4.5 s on 4 AVX-512 cores).
        from concurrent.futures import ThreadPoolExecutor
        from make_bench_assets import load_profile_row
        from witch_tpu.native import _domaindef
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
        return time.time() - t0, true_cells  # no padding on native path

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
                result["v"] = run_tpu_tier()
            except Exception as e:
                result["err"] = e

        th = threading.Thread(target=tpu_work, daemon=True)
        th.start()
        th.join(budget)
        if "v" in result:
            dt, padded_cells = result["v"]
        else:
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
    else:
        dt, padded_cells = run_cpu_tier()

    pairs_per_s = total_pairs / dt
    baseline_pairs_per_s = 70500 / (236.2 / 4)

    # secondary metric: the native domaindef engine (reporting gate +
    # exact null2 + f64 Forward) on one model vs all queries — the
    # per-candidate gate cost behind the Forward pre-ranker.
    dd_pairs_per_s = None
    try:
        from witch_tpu.native import _domaindef
        b0 = banks[0]
        h0 = 0
        from witch_tpu.hmm.profile import configure
        # rebuild a single-core profile from the bank is not possible;
        # instead reuse the committed assets' first model via the repo
        # oracle-free path: skip if profiles unavailable
        prof = None
        try:
            from make_bench_assets import load_profile0
            prof = load_profile0(os.path.join(HERE, "bench_assets.npz"))
        except Exception:
            prof = None
        if prof is not None:
            args = [np.ascontiguousarray(prof.msc, np.float64)] + [
                np.ascontiguousarray(getattr(prof, a), np.float64)
                for a in ("t_mm", "t_mi", "t_md", "t_im", "t_ii",
                          "t_dm", "t_dd", "bm")]
            clist = [np.ascontiguousarray(codes[i, :lens[i]], np.int32)
                     for i in range(min(Q, 100))]
            t0 = time.time()
            _domaindef.evaluate_targets(*args, clist, 42, 200, 1, 4)
            dd = time.time() - t0
            dd_pairs_per_s = round(len(clist) / dd, 1)
            log("domaindef: %d pairs in %.2fs" % (len(clist), dd))
    except Exception as e:
        log("domaindef metric skipped: %s" % e)

    extra = {}
    if dd_pairs_per_s is not None:
        extra["domaindef_pairs_per_s_4t"] = dd_pairs_per_s
    print(json.dumps({
        "metric": "forward_scoring_pairs_per_s",
        "value": round(pairs_per_s, 1),
        "unit": "query-HMM pairs/s (141-HMM eHMM x 500 queries, 1 chip)",
        "vs_baseline": round(pairs_per_s / baseline_pairs_per_s, 2),
        "gcups_true": round(true_cells / dt / 1e9, 2),
        "gcups_padded": round(padded_cells / dt / 1e9, 2),
        "seconds_per_full_grid": round(dt, 3),
        "backend": "pallas-tpu" if on_tpu else "native-cpu",
        **extra,
    }), flush=True)


if __name__ == "__main__":
    main()
