"""Bijectors mapping constrained parameter values to unconstrained storage.

The reference library stores all positive parameters on the log scale and the
OU mean-reversion rate ``phi`` on the logit scale so that MCMC proposals are
Gaussian random walks on R^n (reference: SdeParameters.scala:192-216).

Everything here is pure jax and broadcasts over arbitrary leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def logit(p):
    """Log-odds transform (0, 1) -> R.  Reference: SdeParameters.scala:210-212."""
    p = jnp.asarray(p)
    return jnp.log(p) - jnp.log1p(-p)


def logistic(x):
    """Inverse of :func:`logit`, R -> (0, 1).  Reference: SdeParameters.scala:214-216.

    Numerically stable for large |x| (evaluates exp of a non-positive number
    on both branches).
    """
    x = jnp.asarray(x)
    return jnp.where(
        x >= 0,
        1.0 / (1.0 + jnp.exp(-jnp.abs(x))),
        jnp.exp(-jnp.abs(x)) / (1.0 + jnp.exp(-jnp.abs(x))),
    )


def to_log(value):
    """Constrained positive value -> unconstrained (log) storage."""
    return jnp.log(jnp.asarray(value, dtype=jnp.result_type(float)))


def from_log(stored):
    """Unconstrained (log) storage -> constrained positive value."""
    return jnp.exp(stored)


def to_logit(value):
    """Constrained (0,1) value -> unconstrained (logit) storage.

    NOTE: the reference's constrained smart constructor ``ouParameter``
    applies ``logistic`` here (SdeParameters.scala:204) even though the
    process itself applies ``logistic`` again when reading the stored value
    (Sde.scala:136) -- an upstream bug.  We use the mathematically correct
    inverse (logit) so that ``constrain(unconstrain(x)) == x``.
    """
    return logit(value)


def from_logit(stored):
    return logistic(stored)
