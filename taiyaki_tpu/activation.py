"""Elementwise activation functions (JAX).

Same catalogue and names as the reference (taiyaki/activation.py) — the
names are interop contracts: layer JSON export refers to activations by
function __name__ and model description files import them by name.

Several are M-estimator-derived bounded activations; see the reference for
provenance notes.
"""

import jax
import jax.numpy as jnp


# -- Unbounded ---------------------------------------------------------------

def sqr(x):
    return jnp.square(x)


def linear(x):
    return x


def relu(x):
    return jax.nn.relu(x)


def relu_smooth(x):
    """C1 variant of relu: 0 for x<=0, x^2 on (0,1], 2x-1 for x>1."""
    y = jnp.clip(x, 0.0, 1.0)
    return jnp.square(y) - 2.0 * y + x + jnp.abs(x)


def softplus(x):
    """log(1 + exp(x)), computed stably as relu(x) + log1p(exp(-|x|))."""
    return jax.nn.relu(x) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def elu(x, alpha=1.0):
    return jax.nn.elu(x, alpha)


def selu(x, alpha=1.6733, lam=1.0507):
    return lam * jnp.where(x > 0, x, alpha * jnp.expm1(x))


def gelu(x):
    """Gaussian Error Linear Unit, logistic approximation x*sigmoid(1.702x)
    (the form the reference uses; taiyaki/activation.py:96)."""
    return x * jax.nn.sigmoid(1.702 * x)


def exp(x):
    return jnp.exp(x)


def swish(x):
    """x * sigmoid(x) (aka SiLU)."""
    return x * jax.nn.sigmoid(x)


# -- Bounded -----------------------------------------------------------------

def tanh(x):
    return jnp.tanh(x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def erf(x):
    return jax.lax.erf(x)


def L1mL2(x):
    """Weight function of the L2-L1 M-estimator: x / sqrt(1 + x^2/2)."""
    return x / jnp.sqrt(1.0 + 0.5 * jnp.square(x))


def fair(x):
    return x / (1.0 + jnp.abs(x) / 1.3998)


def retu(x):
    """Rectified tanh."""
    return jnp.where(x > 0, jnp.tanh(x), 0.0)


def tanh_pm(x):
    """Poor man's tanh: tangent at 0, clipped to [-1, 1]."""
    return jnp.clip(x, -1.0, 1.0)


def sigmoid_pm(x):
    """Poor man's sigmoid: tangent at 0, clipped to [0, 1]."""
    return jnp.clip(0.5 + 0.25 * x, 0.0, 1.0)


def bounded_linear(x):
    return jnp.clip(x, -1.0, 1.0)


def sin(x):
    return jnp.sin(x)


# -- Redescending (M-estimator derived) --------------------------------------

def cauchy(x):
    return x / (1.0 + jnp.square(x / 2.3849))


def geman_mcclure(x):
    """Weight function of the Geman-McClure M-estimator: x / (1 + x^2)^2."""
    return x / jnp.square(1.0 + jnp.square(x))


def welsh(x):
    return x * jnp.exp(-jnp.square(x / 2.9846))
