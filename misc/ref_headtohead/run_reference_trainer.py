"""Run the UNMODIFIED reference trainer (/root/reference/bin/train_flipflop.py)
on this host, with the unbuildable Cython `taiyaki.ctc` extension replaced by
the numerically-pinned pure-torch shim (ctc_shim.py — see its docstring for
why the reference's own pure-torch fallback cannot run under modern torch).

Everything else — model definition, data layer, chunk selection/filtering,
optimizer, LR schedule, gradient capping, logging — is the reference's own
code executing from /root/reference.

Usage: python run_reference_trainer.py <train_flipflop args...>
"""

import runpy
import sys
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    sys.path.insert(0, HERE)
    sys.path.insert(0, "/root/reference/bin")
    sys.path.insert(0, "/root/reference")

    # `imp` was removed in Python 3.12; the reference's helpers.py:27 uses
    # only imp.load_source.  Provide that one function via importlib.
    import types
    import importlib.util

    def _load_source(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    imp_shim = types.ModuleType("imp")
    imp_shim.load_source = _load_source
    sys.modules.setdefault("imp", imp_shim)

    # numpy 2.x removed the np.NAN/np.Inf aliases the reference uses
    # (helpers.py:231); restore them for this process only.
    import numpy as np
    for alias, val in (("NAN", np.nan), ("NaN", np.nan), ("Inf", np.inf),
                       ("Infinity", np.inf), ("PINF", np.inf)):
        if not hasattr(np, alias):
            setattr(np, alias, val)

    import taiyaki
    import ctc_shim
    sys.modules["taiyaki.ctc"] = ctc_shim
    taiyaki.ctc = ctc_shim

    sys.argv = ["train_flipflop.py"] + sys.argv[1:]
    runpy.run_path("/root/reference/bin/train_flipflop.py",
                   run_name="__main__")


if __name__ == "__main__":
    main()
