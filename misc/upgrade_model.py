#!/usr/bin/env python3
"""Upgrade model checkpoints to the current MODEL_VERSION
(reference: misc/upgrade_model.py).

For this framework's own checkpoints, versions only exist from 3 onward
(the reference's v0-v2 formats are torch pickles; import those with
misc/import_torch_checkpoint.py instead, which stamps the current version).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu import MODEL_VERSION  # noqa: E402
from taiyaki_tpu.utils.cmdargs import FileAbsent, FileExists  # noqa: E402
from taiyaki_tpu.utils.common_cmdargs import add_common_command_args  # noqa


def get_parser():
    parser = argparse.ArgumentParser(
        description="Upgrade a model checkpoint to the current version",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_command_args(parser, ["version"])
    parser.add_argument("input", action=FileExists,
                        help="Model checkpoint to upgrade")
    parser.add_argument("output", action=FileAbsent,
                        help="Upgraded model checkpoint")
    return parser


def main():
    args = get_parser().parse_args()
    try:
        with open(args.input, "rb") as fh:
            ckpt = pickle.load(fh)
    except Exception as e:
        sys.exit(
            "Could not read {} as a taiyaki_tpu checkpoint ({}).\n"
            "If this is a reference (torch) checkpoint, use "
            "misc/import_torch_checkpoint.py instead.".format(
                args.input, e))
    if not isinstance(ckpt, dict) or "metadata" not in ckpt:
        sys.exit("Not a taiyaki_tpu checkpoint; use "
                 "misc/import_torch_checkpoint.py for torch checkpoints.")
    version = ckpt["metadata"].get("version")
    if version == MODEL_VERSION:
        print("Model already at version {}".format(MODEL_VERSION))
    else:
        print("Upgrading model from version {} to {}".format(
            version, MODEL_VERSION))
        ckpt["metadata"]["version"] = MODEL_VERSION
        ckpt["metadata"].setdefault("reverse", False)
        ckpt["metadata"].setdefault("standardize", True)
    with open(args.output, "wb") as fh:
        pickle.dump(ckpt, fh)
    print("Wrote", args.output)


if __name__ == "__main__":
    main()
