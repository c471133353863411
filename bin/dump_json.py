#!/usr/bin/env python3
"""Dump a Guppy-loadable JSON representation of a model
(reference: bin/dump_json.py)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu.utils.cmdargs import FileExists  # noqa: E402
from taiyaki_tpu.utils.common_cmdargs import add_common_command_args  # noqa
from taiyaki_tpu.utils.helpers import (  # noqa: E402
    file_md5, load_model, open_file_or_stdout)
from taiyaki_tpu.utils.json import JsonEncoder  # noqa: E402


def get_parser():
    parser = argparse.ArgumentParser(
        description="Dump JSON representation of model",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_command_args(parser, ["output"])
    parser.add_argument("model", action=FileExists, help="Checkpoint file to export")
    return parser


def main():
    args = get_parser().parse_args()
    model_md5 = file_md5(args.model)
    net, params, _, _, _, _ = load_model(args.model)
    if params is None:
        sys.exit("* Error: {} has no parameters (pass a .checkpoint)"
                 .format(args.model))
    json_out = net.json(params)
    json_out["md5sum"] = model_md5
    with open_file_or_stdout(args.output) as fh:
        json.dump(json_out, fh, indent=4, cls=JsonEncoder)


if __name__ == "__main__":
    main()
