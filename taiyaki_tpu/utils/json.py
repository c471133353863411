"""JSON encoder for model export (reference: taiyaki/json.py:11-60).

Serializes numpy scalars/arrays and JAX arrays so that layer `json()`
structures dump directly to Guppy-loadable JSON.
"""

import json

import numpy as np


class JsonEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if hasattr(obj, "__array__"):   # jax.Array and friends
            return np.asarray(obj).tolist()
        return super().default(obj)
