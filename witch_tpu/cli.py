"""CLI argument parser, mirroring the reference's flag surface
(witch_msa/__init__.py:32-233) so existing WITCH invocations port directly.
"""

from __future__ import annotations

from argparse import ArgumentParser, RawDescriptionHelpFormatter

from . import __version__

EXAMPLES = """Example usages:
> Default usage - unaligned input sequences
  %(prog)s -i input.fasta -d witch_output/ -o alignment.fasta

> Adding new sequences to an existing backbone alignment (no tree)
  %(prog)s -q new_seqs.fasta -b existing_aln.fasta

> Adding new sequences to an existing backbone alignment (with tree)
  %(prog)s -q new_seqs.fasta -b existing_aln.fasta -e existing_aln.nwk

> Using 5 HMMs to align non-backbone sequences, HMMs of 50-100 sequences
  %(prog)s -i input.fasta -k 5 -A 50 -Z 100
"""


def init_parser() -> ArgumentParser:
    parser = ArgumentParser(
        description=("WITCH-TPU: a TPU-native re-implementation of WITCH "
                     "(WeIghTed Consensus Hmm alignment)."),
        conflict_handler="resolve",
        epilog=EXAMPLES,
        formatter_class=RawDescriptionHelpFormatter)
    parser.add_argument("-v", "--version", action="version",
                        version="%(prog)s " + __version__)

    basic = parser.add_argument_group("BASIC PARAMETERS")
    basic.add_argument("-i", "--input-path", type=str,
                       help="Path to the input unaligned file "
                            "(all sequences).")
    basic.add_argument("-p", "--hmmdir", type=str,
                       help="Path to the HMMs directory generated from a "
                            "previous (UPP/WITCH/witch-tpu) decomposition")
    basic.add_argument("-b", "--backbone-path", type=str,
                       help="Path to the backbone alignment")
    basic.add_argument("-e", "--backbone-tree-path", type=str,
                       help="Path to the backbone tree")
    basic.add_argument("-q", "--query-path", type=str,
                       help="Path to the queries file to align")
    basic.add_argument("-d", "--outdir", type=str, default="witch_output",
                       help="Output directory. Default: witch_output/")
    basic.add_argument("-o", "--output-path", type=str,
                       default="aligned.fasta",
                       help="Output file name (a <name>.masked.fasta "
                            "is also written). Default: aligned.fasta")
    basic.add_argument("-t", "--num-cpus", type=int, default=-1,
                       help="Number of cpus for host-side parallelism. "
                            "Default: -1 (all)")
    basic.add_argument("--max-concurrent-jobs", type=int, default=None,
                       metavar="INT",
                       help="Max concurrently running host jobs. "
                            "Default: min(50, 10*num_cpus)")
    basic.add_argument("--timeout", type=int, default=120, metavar="INT",
                       help="Per-query alignment timeout seconds "
                            "(compat flag). Default: 120")
    basic.add_argument("-c", "--config-file", type=str, default=None,
                       help="User config file (cmdline > user > main)")

    witch = parser.add_argument_group("WITCH OPTIONS")
    witch.add_argument("-m", "--mode", type=str, default="witch-ng",
                       choices=["old-witch", "witch-ng"],
                       help="Query-merge mode. Default: witch-ng")
    witch.add_argument("--keeptemp", action="store_const", const=True,
                       default=False, help="Keep ALL temporary files")
    witch.add_argument("--keep-decomposition", type=int, default=1,
                       metavar="{0,1}",
                       help="Keep tree decomposition artifacts. Default: 1")
    witch.add_argument("-k", "--num-hmms", type=int, default=10,
                       help="Max top-scored HMMs per query (adaptive "
                            "inclusion to weight 0.999). Default: 10")
    witch.add_argument("-w", "--use-weight", type=int, default=1,
                       metavar="{0,1}",
                       help="Use adjusted bitscore weights. Default: 1")
    witch.add_argument("--save-weight", type=int, default=0,
                       metavar="{0,1}",
                       help="Save weights to [outdir]/weights.txt. "
                            "Default: 0")
    witch.add_argument("-A", "--alignment-size", type=int, default=10,
                       help="Min decomposition subset size. Default: 10")
    witch.add_argument("-Z", "--alignment-upper-bound", type=int,
                       default=None,
                       help="Max decomposition subset size. Default: None")
    witch.add_argument("--molecule", type=str, default=None,
                       choices=["amino", "dna", "rna"],
                       help="Input molecule type. Default: infer")

    misc = parser.add_argument_group("MISCELLANEOUS OPTIONS")
    misc.add_argument("-y", "--bypass-setup", action="store_const",
                      const=True, default=True,
                      help="(compat) bypass initial setup")
    return parser
