"""Argument parsers for the bin/ scripts
(reference: bin/_bin_argparse.py — same option surface so command lines are
drop-in compatible; TPU-specific additions are marked)."""

import argparse

from taiyaki_tpu import __version__
from taiyaki_tpu.utils.cmdargs import (
    AutoBool, Bounded, DeviceAction, display_version_and_exit, FileExists,
    Maybe, NonNegative, ParseToNamedTuple, Positive)


def get_train_flipflop_parser():
    parser = argparse.ArgumentParser(
        description='Train flip-flop neural network',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)

    mdl_grp = parser.add_argument_group('Model Arguments')
    mdl_grp.add_argument(
        '--size', default=384, metavar='neurons', type=Positive(int),
        help='Width (hidden units) of the recurrent layers')
    mdl_grp.add_argument(
        '--stride', default=5, metavar='samples', type=Positive(int),
        help='Downsampling stride of the convolution front end')
    mdl_grp.add_argument(
        '--winlen', default=19, type=Positive(int),
        help='Convolution front-end window width in samples')

    trn_grp = parser.add_argument_group('Training Arguments')
    trn_grp.add_argument(
        '--adam', nargs=2, metavar=('beta1', 'beta2'),
        default=[0.9, 0.999], type=NonNegative(float),
        help='Adam first/second-moment decay rates (beta1, beta2)')
    trn_grp.add_argument(
        '--eps', default=1e-6, metavar='adjustment', type=Positive(float),
        help='Adam denominator epsilon (numerical stability)')
    trn_grp.add_argument(
        '--niteration', metavar='batches', type=Positive(int),
        default=150000, help='Total training iterations (optimizer steps)')
    trn_grp.add_argument(
        '--weight_decay', default=0.01, metavar='penalty',
        type=NonNegative(float),
        help='Decoupled (AdamW) weight-decay coefficient')
    trn_grp.add_argument(
        '--gradient_clip_num_mads', default=0, metavar='num_MADs',
        type=Maybe(NonNegative(float)),
        help='Value-clip gradients at this many MADs above the running '
             'median of recent (last 1000) per-step gradient maxima; pass '
             '"None" to disable clipping.')
    trn_grp.add_argument(
        '--lr_max', default=4.0e-3, metavar='rate', type=Positive(float),
        help='Peak learning rate, hit at the end of the warmup ramp '
             '(--warmup_batches steps).')
    trn_grp.add_argument(
        '--lr_min', default=1.0e-4, metavar='rate', type=Positive(float),
        help='Learning-rate floor; the schedule starts and ends here')
    trn_grp.add_argument(
        '--seed', default=None, metavar='integer', type=Positive(int),
        help='Seed for all RNGs (parameter init and data order)')
    trn_grp.add_argument(
        '--sharpen', default=(1.0, 1.0, 25000), nargs=3,
        metavar=('min', 'max', 'niter'), action=ParseToNamedTuple,
        type=(Positive(float), Positive(float), Positive(int)),
        help='Linear sharpening-factor ramp: "min" at iteration 0 rising '
             'to "max" after "niter" iterations')
    trn_grp.add_argument(
        '--warmup_batches', type=int, default=200,
        help='Warmup length: ramp the learning rate up over the first n '
             'optimizer steps (cosine-shaped ramp).')
    trn_grp.add_argument(
        '--lr_warmup', metavar='rate', type=Positive(float),
        help='Learning rate at the very start of warmup (default: lr_min)')
    trn_grp.add_argument(
        '--min_momentum', type=Positive(float),
        help='Lower bound for momentum cycling; omit to keep momentum '
             'fixed at Adam beta1')

    data_grp = parser.add_argument_group('Data Arguments')
    data_grp.add_argument(
        '--filter_max_dwell', default=10.0, metavar='multiple',
        type=Maybe(Positive(float)),
        help='Reject a chunk when its longest single-base dwell exceeds '
             'this multiple of the median dwell')
    data_grp.add_argument(
        '--filter_mean_dwell', default=3.0, metavar='radius',
        type=Maybe(Positive(float)),
        help='Drop chunks with mean dwell more than radius deviations from '
             'the median (over chunks)')
    data_grp.add_argument(
        '--filter_min_pass_fraction', default=0.5, metavar='fraction',
        type=Maybe(Positive(float)),
        help='Abort the run when the chunk-filter pass rate falls below '
             'this fraction')
    data_grp.add_argument(
        '--filter_path_buffer', default=1.1, metavar='ratio',
        type=Bounded(float, lower=1.0, upper=float('inf')),
        help='Reject a chunk unless its signal length exceeds '
             '(bases * stride * this ratio); must be > 1.0 so a valid '
             'flip-flop path exists')
    data_grp.add_argument(
        '--limit', default=None, type=Maybe(Positive(int)),
        help='Use at most this many reads from the input')
    data_grp.add_argument(
        '--reverse', default=False, action=AutoBool,
        help='Flip both signal and sequence time order (RNA reads 3p->5p)')
    data_grp.add_argument(
        '--sample_nreads_before_filtering', metavar='n',
        type=NonNegative(int), default=100000,
        help='Estimate chunk-filter bounds from a sample of n reads '
             '(0 = use every read)')
    data_grp.add_argument(
        '--chunk_len_min', default=3000, metavar='samples',
        type=Positive(int),
        help='Shortest chunk length to sample, in signal samples')
    data_grp.add_argument(
        '--chunk_len_max', default=8000, metavar='samples',
        type=Positive(int),
        help='Longest chunk length to sample, in signal samples (each '
             'batch draws one length between the min and max)')
    data_grp.add_argument(
        '--chunk_len_buckets', default=8, metavar='n', type=Positive(int),
        help='(TPU) Number of distinct chunk lengths sampled from '
             '[chunk_len_min, chunk_len_max]; bounds XLA recompilation.')
    data_grp.add_argument(
        '--seqlen_buckets', default=True, action=AutoBool,
        help='(TPU) Pad each batch\'s sequences to the smallest multiple '
             'of 128 that fits it instead of to the worst-case path-buffer '
             'bound — skips CRF-lattice compute on padding. Under '
             '--multihost the data-dependent bucket choice is synchronized '
             'across hosts with a TCP max-reduction (utils/hostsync.py).')
    data_grp.add_argument(
        '--include_reporting_strands', default=False, action=AutoBool,
        help='Train on the validation (reporting) reads too, instead of '
             'holding them out')
    data_grp.add_argument(
        '--input_strand_list', default=None, action=FileExists,
        help='Restrict training to the read_id column of this TSV '
             '(any filename columns present are not used)')
    data_grp.add_argument(
        '--min_sub_batch_size', default=128, metavar='chunks',
        type=Positive(int),
        help='Chunks per sub-batch at the longest chunk length; shorter '
             'chunk lengths scale the sub-batch up proportionally '
             '(min_sub_batch_size * chunk_len_max / chunk_len) so each '
             'sub-batch holds a roughly constant number of samples.')
    data_grp.add_argument(
        '--reporting_percent_reads', default=1, metavar='sub_batches',
        type=Positive(float),
        help='Percentage of reads held out as the validation set')
    data_grp.add_argument(
        '--reporting_strand_list', action=FileExists,
        help='TSV whose read_id column names the validation reads; '
             'chosen at random when omitted.')
    data_grp.add_argument(
        '--reporting_sub_batches', default=100, metavar='sub_batches',
        type=Positive(int),
        help='How many sub-batches to evaluate for the validation loss')
    data_grp.add_argument(
        '--standardize', default=True, action=AutoBool,
        help='Normalize each read\'s current (zero median, unit MAD) '
             'before chunking')
    data_grp.add_argument(
        '--sub_batches', default=1, metavar='sub_batches',
        type=Positive(int),
        help='Sub-batches accumulated into each optimizer step')

    cmp_grp = parser.add_argument_group('Compute Arguments')
    cmp_grp.add_argument(
        '--device', default='tpu', action=DeviceAction,
        help='Device to run on: "tpu" (default) or "cpu".')
    cmp_grp.add_argument(
        '--multihost', default=False, action=AutoBool,
        help='Initialise jax.distributed for multi-host training '
             '(coordinator discovered from the TPU environment).')
    cmp_grp.add_argument(
        '--remat', default=False, action=AutoBool,
        help='Rematerialize layer activations in the backward pass '
             '(jax.checkpoint per layer): slower steps, much lower peak '
             'memory — unlocks batch/chunk sizes past the single-chip '
             'HBM wall.')

    out_grp = parser.add_argument_group('Output Arguments')
    out_grp.add_argument(
        '--full_filter_status', default=False, action=AutoBool,
        help='Log per-criterion chunk rejection counts rather than just '
             'the overall rejected fraction')
    out_grp.add_argument(
        '--outdir', default='training',
        help='Directory for logs and checkpoints (created on startup)')
    out_grp.add_argument(
        '--overwrite', default=False, action=AutoBool,
        help='Replace an existing output directory instead of aborting')
    out_grp.add_argument(
        '--quiet', default=False, action=AutoBool,
        help='Suppress progress output on stdout')
    out_grp.add_argument(
        '--save_every', metavar='x', type=Positive(int), default=2500,
        help='Write a checkpoint every x iterations')
    out_grp.add_argument(
        '--profile', default=False, action=AutoBool,
        help='Capture a jax profiler trace of iterations 10-15 into '
             'outdir/profile')

    mod_grp = parser.add_argument_group('Modified Base Arguments')
    mod_grp.add_argument(
        '--mod_factor', default=(8.0, 1.0, 50000), nargs=3,
        metavar=('start', 'final', 'niter'), action=ParseToNamedTuple,
        type=(Positive(float), Positive(float), Positive(int)),
        help='Relative weight applied to modified base transitions, ramped '
             'linearly from "start" to "final" over first "niter" '
             'iterations')
    mod_grp.add_argument(
        '--mod_prior_factor', type=float,
        help='Raise the data-estimated mod-base prior weights to this '
             'power; omit for no prior reweighting')
    mod_grp.add_argument(
        '--num_mod_weight_reads', type=int, default=5000,
        help='Sample size (reads) for estimating the modified-base prior '
             'weights from the training data.')

    misc_grp = parser.add_argument_group('Miscellaneous Arguments')
    misc_grp.add_argument(
        '--version', nargs=0, action=display_version_and_exit,
        metavar=__version__, help='Print the version string and exit.')

    parser.add_argument(
        'model', action=FileExists,
        help='Model definition (.py) or checkpoint file to start from')
    parser.add_argument(
        'input', action=FileExists,
        help='mapped-signal HDF5 file with the training reads')

    return parser
