"""Configuration system: cmdline > user config (-c) > main config.

Mirrors the reference's layered precedence (witch_msa/configs.py:240-264):
a config file's [commandline] section becomes synthetic argv prepended
before the real argv; other sections become namespaces on Configs. The
reference's ~/.witch_msa bootstrap dealt with locating tool binaries —
obsolete here (no external binaries), so main config is optional at
~/.witch_tpu/main.config.
"""

from __future__ import annotations

import configparser
import os
import time
from argparse import Namespace
from typing import List, Optional


class Configs:
    # paths
    input_path: Optional[str] = None
    hmmdir: Optional[str] = None
    backbone_path: Optional[str] = None
    backbone_tree_path: Optional[str] = None
    query_path: Optional[str] = None
    outdir: str = "witch_output"
    output_path: str = "aligned.fasta"

    keeptemp: bool = False
    keep_decomposition: bool = True

    # WITCH options
    mode: str = "witch-ng"
    num_hmms: int = 10
    use_weight: bool = True
    save_weight: bool = False
    alignment_size: int = 10
    alignment_upper_bound: Optional[int] = None
    molecule: Optional[str] = None
    timeout: int = 120

    num_cpus: int = -1
    max_concurrent_jobs: Optional[int] = None

    # log paths
    log_path: Optional[str] = None
    error_path: Optional[str] = None
    debug_path: Optional[str] = None
    runtime_path: Optional[str] = None

    @staticmethod
    def write(msg, level, path):
        if path is not None:
            with open(path, "a") as f:
                f.write("{}\t[{}] {}\n".format(
                    time.strftime("%Y-%m-%d %H:%M:%S"), level, msg))

    @staticmethod
    def log(msg):
        Configs.write(msg, "LOG", Configs.log_path)

    @staticmethod
    def warning(msg):
        Configs.write(msg, "WARNING", Configs.log_path)

    @staticmethod
    def debug(msg):
        Configs.write(msg, "DEBUG", Configs.debug_path)

    @staticmethod
    def error(msg):
        Configs.write(msg, "ERROR", Configs.error_path)

    @staticmethod
    def runtime(msg):
        if Configs.runtime_path:
            with open(Configs.runtime_path, "a") as f:
                f.write("{}\n".format(msg))


def _config_file_to_argv(path: str) -> List[str]:
    cp = configparser.ConfigParser()
    cp.optionxform = str
    with open(path) as f:
        cp.read_file(f)
    argv = []
    if cp.has_section("commandline"):
        for k, v in cp.items("commandline"):
            argv.append("--{}".format(k))
            argv.append(v)
    return argv


def main_config_path() -> Optional[str]:
    p = os.path.join(os.path.expanduser("~"), ".witch_tpu", "main.config")
    return p if os.path.exists(p) else None


def build_configs(parser, cmdline_args: List[str]) -> Namespace:
    """Parse with layered precedence and populate Configs."""
    default_argv: List[str] = []
    mc = main_config_path()
    if mc:
        default_argv += _config_file_to_argv(mc)
    args = parser.parse_args(cmdline_args)
    user_argv: List[str] = []
    if getattr(args, "config_file", None):
        user_argv += _config_file_to_argv(args.config_file)
    args = parser.parse_args(default_argv + user_argv + cmdline_args)

    for name in ("input_path", "hmmdir", "backbone_path",
                 "backbone_tree_path", "query_path"):
        v = getattr(args, name, None)
        # always assign (None resets state from any previous invocation
        # in the same process)
        setattr(Configs, name,
                os.path.realpath(v) if v is not None else None)

    Configs.outdir = os.path.realpath(args.outdir)
    os.makedirs(Configs.outdir, exist_ok=True)
    Configs.output_path = os.path.join(Configs.outdir, args.output_path)

    Configs.keeptemp = bool(args.keeptemp)
    Configs.keep_decomposition = args.keep_decomposition == 1
    Configs.mode = args.mode
    if args.num_hmms > 0:
        Configs.num_hmms = args.num_hmms
    Configs.use_weight = args.use_weight == 1
    Configs.save_weight = args.save_weight == 1
    Configs.alignment_size = args.alignment_size
    if args.alignment_upper_bound is not None:
        Configs.alignment_upper_bound = (args.alignment_upper_bound
                                         if args.alignment_upper_bound > 0
                                         else None)
    Configs.molecule = args.molecule
    Configs.timeout = args.timeout
    Configs.num_cpus = args.num_cpus if args.num_cpus > 0 else os.cpu_count()
    Configs.max_concurrent_jobs = (args.max_concurrent_jobs or
                                   min(50, 10 * Configs.num_cpus))

    Configs.log_path = os.path.join(Configs.outdir, "log.txt")
    Configs.error_path = os.path.join(Configs.outdir, "error.txt")
    Configs.debug_path = os.path.join(Configs.outdir, "debug.txt")
    Configs.runtime_path = os.path.join(Configs.outdir,
                                        "runtime_breakdown.txt")
    return args
