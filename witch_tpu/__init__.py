"""WITCH-TPU: a TPU-native re-implementation of WITCH (WeIghTed Consensus
Hmm alignment; reference: c5shen/WITCH). Profile-HMM construction, Forward
scoring, posterior-OA alignment, and the weighted merge all run as batched
JAX/XLA array programs instead of the reference's subprocess farm."""

__version__ = "0.1.0"


def configure_jax():
    """Platform probe + compilation-cache setup shared by the CLI
    entry (witch_runner) and the resident server (server.serve)."""
    import os
    import sys
    import time

    # The axon plugin overrides JAX_PLATFORMS; honor an explicit choice.
    # An explicit JAX_PLATFORMS=cpu in the environment counts as one:
    # the accelerator probe would otherwise contact the remote device
    # (the plugin ignores the env var) with a multi-minute worst case —
    # exactly what a CPU-pinned test/CI environment is trying to avoid.
    platform = os.environ.get("WITCH_TPU_PLATFORM")
    if not platform and \
            os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        platform = "cpu"
    if not platform and not os.environ.get("WITCH_TPU_NO_DAEMON") \
            and not os.environ.get("WITCH_TPU_IN_SERVER"):
        # A live resident daemon means the accelerator side is already
        # established there — this process only submits a job, so the
        # (minutes-slow on a sick tunnel) device probe is pure waste.
        try:
            from . import server
            if server.server_alive(server.default_jobs_dir()):
                os.environ["WITCH_TPU_PROBED_PLATFORM"] = "daemon"
                return
        except Exception:
            pass
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
        os.environ["WITCH_TPU_PROBED_PLATFORM"] = platform
    else:
        # Device health probe: a remote-TPU tunnel can die mid-session
        # (observed: "remote_compile: Connection refused" after the
        # relay dropped), which would otherwise kill the run at the
        # first compile. Probe in a subprocess so a broken backend
        # never contaminates this process, and fall back to CPU.
        import subprocess
        ok = False
        # Session establishment against the remote accelerator is wildly
        # variable (measured this machine: 11.6 s to >350 s for the same
        # trivial compute). The CLI keeps a modest budget and falls back
        # to the AVX-512 CPU engine; long-lived processes (server.serve)
        # pass a patient budget via WITCH_TPU_PROBE_TIMEOUT since they
        # amortize it over many jobs.
        probe_timeout = float(os.environ.get("WITCH_TPU_PROBE_TIMEOUT",
                                             120))
        for attempt in range(3):
            try:
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import jax, numpy\n"
                     "d = jax.devices()\n"
                     "x = jax.numpy.zeros(8) + 1\n"
                     "assert float(numpy.asarray(x).sum()) == 8.0\n"
                     "print(d[0].platform)"],
                    capture_output=True, text=True, timeout=probe_timeout)
                ok = r.returncode == 0
                if ok:
                    # remember what the probe saw (e.g. "TPU"/"axon" vs
                    # "cpu") so callers can branch without re-probing or
                    # initializing a backend in this process
                    os.environ["WITCH_TPU_PROBED_PLATFORM"] = \
                        (r.stdout.strip().splitlines() or ["unknown"])[-1]
            except Exception:
                ok = False
            if ok:
                break
            sys.stderr.write(
                "WARNING: accelerator probe attempt %d failed%s\n"
                % (attempt + 1, "; retrying" if attempt < 2 else ""))
            time.sleep(5 * (attempt + 1))
        if not ok:
            import jax
            jax.config.update("jax_platforms", "cpu")
            os.environ["WITCH_TPU_PROBED_PLATFORM"] = "cpu"
            sys.stderr.write(
                "WARNING: accelerator probe failed; falling back to "
                "CPU (set WITCH_TPU_PLATFORM to override)\n")
    try:
        import jax
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("WITCH_TPU_JAX_CACHE",
                           os.path.join(os.path.dirname(__file__), "..",
                                        ".jax_cache")))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass


def witch_runner(argv=None):
    import os
    import sys
    import time

    configure_jax()

    cmdline_args = sys.argv[1:] if argv is None else argv

    # Resident-daemon product path (remote-accelerator hosts): a fresh
    # process pays remote program compilation/load on every run
    # (measured 12-600 s per program); a resident server pays it once
    # and keeps the programs warm. When the accelerator probe succeeded,
    # transparently submit this invocation to the daemon (starting one
    # on first use) instead of running in-process. Opt out with
    # WITCH_TPU_NO_DAEMON=1; CPU runs never use the daemon (nothing to
    # keep warm).
    probed = os.environ.get("WITCH_TPU_PROBED_PLATFORM", "cpu")
    if probed.lower() not in ("", "cpu") \
            and not os.environ.get("WITCH_TPU_NO_DAEMON") \
            and not os.environ.get("WITCH_TPU_IN_SERVER"):
        from . import server
        s1 = time.time()
        res = server.run_via_daemon(cmdline_args)
        if res is not None:
            dt = time.time() - s1
            if res.get("ok"):
                print("\nAll done! WITCH-TPU finished in %.1f seconds "
                      "(resident daemon; job ran %.1fs)..."
                      % (dt, res.get("seconds", 0.0)))
                return res.get("output")
            sys.stderr.write("ERROR (daemon job): %s\n"
                             % res.get("error"))
            raise SystemExit(1)

    from .cli import init_parser
    from .config import Configs, build_configs
    from .pipeline import main_alignment_process

    parser = init_parser()
    build_configs(parser, cmdline_args)
    Configs.log("WITCH-TPU is running with: {}".format(
        " ".join(cmdline_args)))
    s1 = time.time()
    out = main_alignment_process()
    s2 = time.time()
    Configs.log("WITCH-TPU finished in {} seconds...".format(s2 - s1))
    print("\nAll done! WITCH-TPU finished in {:.1f} seconds...".format(
        s2 - s1))
    return out
