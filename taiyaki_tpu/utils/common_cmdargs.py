"""Command-line args shared by multiple bin/ scripts
(reference: taiyaki/common_cmdargs.py)."""

from taiyaki_tpu import __version__
from taiyaki_tpu.constants import DEFAULT_ALPHABET
from taiyaki_tpu.utils.cmdargs import (
    AutoBool, DeviceAction, FileAbsent, FileExists, Maybe, NonNegative,
    Positive, display_version_and_exit)


def add_common_command_args(parser, arglist):
    """Register the named subset of shared options on a parser."""

    ALLOWED_ARGS = {
        "adam": lambda: parser.add_argument(
            "--adam", nargs=2, metavar=("beta1", "beta2"),
            default=[0.9, 0.999], type=NonNegative(float),
            help="Adam first/second-moment decay rates, i.e. beta1/beta2 "
                 "Momentum"),
        "alphabet": lambda: parser.add_argument(
            "--alphabet", default=DEFAULT_ALPHABET,
            help="Alphabet of canonical bases"),
        "device": lambda: parser.add_argument(
            "--device", default="tpu", action=DeviceAction,
            help='Device to use: "tpu" (default), "cpu", or an integer '
                 "device index"),
        "eps": lambda: parser.add_argument(
            "--eps", default=1e-6, metavar="adjustment",
            type=Positive(float), help="Adam denominator epsilon (numerical stability)"),
        "filter_max_dwell": lambda: parser.add_argument(
            "--filter_max_dwell", default=10.0, metavar="multiple",
            type=Maybe(Positive(float)),
            help="Reject chunks whose longest dwell exceeds this multiple of the median "
                 "(over chunks)"),
        "filter_mean_dwell": lambda: parser.add_argument(
            "--filter_mean_dwell", default=3.0, metavar="radius",
            type=Maybe(Positive(float)),
            help="Reject chunks whose mean dwell sits more than radius deviations "
                 "from the median (over chunks)"),
        "input_strand_list": lambda: parser.add_argument(
            "--input_strand_list", default=None, action=FileExists,
            help="TSV selecting reads, keyed by a filename_fast5 or "
                 "read_id or both"),
        "jobs": lambda: parser.add_argument(
            "--jobs", default=1, metavar="n", type=Positive(int),
            help="Worker processes for data preparation"),
        "limit": lambda: parser.add_argument(
            "--limit", default=None, type=Maybe(Positive(int)),
            help="Process at most this many reads"),
        "niteration": lambda: parser.add_argument(
            "--niteration", metavar="batches", type=Positive(int),
            default=100000,
            help="Total optimizer steps to run"),
        "outdir": lambda: parser.add_argument(
            "--outdir", default="training",
            help="Directory for outputs (created on startup)."),
        "output": lambda: parser.add_argument(
            "--output", default=None, metavar="filename", action=FileAbsent,
            help="Destination file (stdout if omitted)"),
        "overwrite": lambda: parser.add_argument(
            "--overwrite", default=False, action=AutoBool,
            help="Replace existing output files instead of aborting"),
        "quiet": lambda: parser.add_argument(
            "--quiet", default=False, action=AutoBool,
            help="Suppress progress output on stdout"),
        "recursive": lambda: parser.add_argument(
            "--recursive", default=True, action=AutoBool,
            help="Descend into subdirectories of input_folder when collecting fast5s. "
                 "Otherwise only search first level."),
        "reverse": lambda: parser.add_argument(
            "--reverse", default=False, action=AutoBool,
            help="Flip both signal and sequence time order (RNA reads 3p->5p)"),
        "sample_nreads_before_filtering": lambda: parser.add_argument(
            "--sample_nreads_before_filtering", metavar="n",
            type=NonNegative(int), default=100000,
            help="Estimate chunk-filter bounds from a sample of n reads before "
                 "training. Set to 0 to do all."),
        "save_every": lambda: parser.add_argument(
            "--save_every", metavar="x", type=Positive(int), default=1000,
            help="Write a checkpoint every x iterations"),
        "version": lambda: parser.add_argument(
            "--version", nargs=0, action=display_version_and_exit,
            metavar=__version__, help="Print the version string and exit."),
        "weight_decay": lambda: parser.add_argument(
            "--weight_decay", default=0.0, metavar="penalty",
            type=NonNegative(float),
            help="Weight-decay (L2) coefficient for Adam"),
        "input_folder": lambda: parser.add_argument(
            "input_folder", action=FileExists,
            help="Folder of fast5 reads (single- or multi-read files)"),
    }

    unknown = frozenset(arglist) - frozenset(ALLOWED_ARGS)
    assert not unknown, "Unsupported argument(s) found : {}".format(unknown)
    for arg in arglist:
        ALLOWED_ARGS[arg]()
