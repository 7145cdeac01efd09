"""Parameter pytrees for SDE families and observation models.

Mirrors the reference's typed parameter records (SdeParameters.scala:14-248,
Parameters.scala:14-153) as JAX pytree dataclasses:

* parameters are stored **unconstrained** (log scale for positive values,
  logit scale for the OU mean-reversion rate phi) so MCMC proposals are
  Gaussian random walks on R^n;
* ``ParamNode(scale, sde)`` pairs an optional observation-scale with the SDE
  parameters of one model component (Parameters.scala:14);
* a composed model's parameters form a binary :class:`~..models.tree.Tree`
  of ``ParamNode`` leaves whose shape matches the model composition;
* flattening a parameter tree to a single R^n vector (the reference
  ``Addable``/``flattenParams`` machinery, Parameters.scala:82-103) is
  ``jax.flatten_util.ravel_pytree`` -- field order below intentionally
  matches the reference flatten order (m0 ++ c0 [++ phi] [++ mu] ++ sigma,
  scale first).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from . import bijectors
from .tree import Branch, Leaf, Tree


def _as_array(x):
    return jnp.atleast_1d(jnp.asarray(x, dtype=jnp.result_type(float)))


# ---------------------------------------------------------------------------
# SDE parameter families
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BrownianParams:
    """Brownian-motion parameters (unconstrained storage).

    Reference: SdeParameters.scala:93-126 (``BrownianParameter``).
    ``c0`` and ``sigma`` are stored on the log scale; ``c0`` is the variance
    of the Gaussian initial state, ``sigma`` the variance rate per unit time.
    """

    m0: jnp.ndarray
    c0: jnp.ndarray
    sigma: jnp.ndarray

    def tree_flatten(self):
        return ((self.m0, self.c0, self.sigma), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def names(self) -> List[str]:
        return (
            _vec_names(self.m0, "m0")
            + _vec_names(self.c0, "C0")
            + _vec_names(self.sigma, "sigma")
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GenBrownianParams:
    """Generalised Brownian motion (drift ``mu``) parameters.

    Reference: SdeParameters.scala:50-91 (``GenBrownianParameter``).
    """

    m0: jnp.ndarray
    c0: jnp.ndarray
    mu: jnp.ndarray
    sigma: jnp.ndarray

    def tree_flatten(self):
        return ((self.m0, self.c0, self.mu, self.sigma), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def names(self) -> List[str]:
        return (
            _vec_names(self.m0, "m0")
            + _vec_names(self.c0, "C0")
            + _vec_names(self.mu, "mu")
            + _vec_names(self.sigma, "sigma")
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class OuParams:
    """Ornstein-Uhlenbeck parameters (unconstrained storage).

    Reference: SdeParameters.scala:128-169 (``OuParameter``).
    ``phi`` (mean-reversion rate, constrained to (0, 1)) is stored on the
    logit scale; ``c0``/``sigma`` on the log scale.
    """

    m0: jnp.ndarray
    c0: jnp.ndarray
    phi: jnp.ndarray
    mu: jnp.ndarray
    sigma: jnp.ndarray

    def tree_flatten(self):
        return ((self.m0, self.c0, self.phi, self.mu, self.sigma), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def names(self) -> List[str]:
        return (
            _vec_names(self.m0, "m0")
            + _vec_names(self.c0, "C0")
            + _vec_names(self.phi, "phi")
            + _vec_names(self.mu, "mu")
            + _vec_names(self.sigma, "sigma")
        )


SdeParams = (BrownianParams, GenBrownianParams, OuParams)


def _vec_names(v, name: str) -> List[str]:
    try:
        n = int(v.shape[-1])
    except Exception:
        n = 1
    return [f"{name}_{i}" for i in range(n)]


# -- constrained smart constructors (reference: SdeParameters.scala:192-205) --


def brownian_params(m0, c0, sigma) -> BrownianParams:
    """Build Brownian parameters from *constrained* (natural-scale) values."""
    return BrownianParams(_as_array(m0), bijectors.to_log(_as_array(c0)),
                          bijectors.to_log(_as_array(sigma)))


def gen_brownian_params(m0, c0, mu, sigma) -> GenBrownianParams:
    return GenBrownianParams(
        _as_array(m0), bijectors.to_log(_as_array(c0)), _as_array(mu),
        bijectors.to_log(_as_array(sigma)))


def ou_params(m0, c0, phi, mu, sigma) -> OuParams:
    """Build OU parameters from constrained values; ``phi`` in (0, 1).

    NOTE: the reference's constrained constructor applies ``logistic`` to phi
    where ``logit`` is the correct inverse (upstream bug,
    SdeParameters.scala:204); we use ``logit`` so round-trips hold.
    """
    return OuParams(
        _as_array(m0), bijectors.to_log(_as_array(c0)),
        bijectors.to_logit(_as_array(phi)), _as_array(mu),
        bijectors.to_log(_as_array(sigma)))


def brownian_params_unconstrained(m0, c0, sigma) -> BrownianParams:
    return BrownianParams(_as_array(m0), _as_array(c0), _as_array(sigma))


def gen_brownian_params_unconstrained(m0, c0, mu, sigma) -> GenBrownianParams:
    return GenBrownianParams(_as_array(m0), _as_array(c0), _as_array(mu), _as_array(sigma))


def ou_params_unconstrained(m0, c0, phi, mu, sigma) -> OuParams:
    return OuParams(_as_array(m0), _as_array(c0), _as_array(phi), _as_array(mu),
                    _as_array(sigma))


def param_repeat(v: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Cyclically recycle a parameter vector to ``dim`` entries.

    Reference: Sde.scala:177-179 (``buildParamRepeat``).
    """
    v = jnp.atleast_1d(v)
    n = v.shape[-1]
    if n == dim:
        return v
    idx = jnp.arange(dim) % n
    return v[..., idx]


# ---------------------------------------------------------------------------
# ParamNode + parameter trees
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ParamNode:
    """(optional observation scale, SDE parameters) for one model component.

    The scale is stored unconstrained; each observation family applies its own
    bijector (exp for positive scales, logistic for the zero-inflation
    probability).  Reference: Parameters.scala:14.
    """

    scale: Optional[jnp.ndarray]
    sde: object

    def tree_flatten(self):
        if self.scale is None:
            return ((self.sde,), "noscale")
        return ((self.scale, self.sde), "scale")

    @classmethod
    def tree_unflatten(cls, aux, children):
        if aux == "noscale":
            return cls(None, children[0])
        return cls(children[0], children[1])

    def names(self) -> List[str]:
        base = ["scale"] if self.scale is not None else []
        return base + self.sde.names()


def param_node(scale, sde) -> ParamNode:
    """Leaf constructor.  ``scale`` is the *unconstrained* observation scale
    (pass ``jnp.log(v)`` for a Gaussian sd of ``v``), or ``None``.

    Reference: Parameters.scala:20-22.
    """
    if scale is not None:
        scale = jnp.asarray(scale, dtype=jnp.result_type(float))
    return ParamNode(scale, sde)


def parameters(scale, sde) -> Tree:
    """Single-component parameter tree (a leaf), as in ``Parameters.apply``."""
    return Leaf(param_node(scale, sde))


# -- flat-vector interop (reference Addable / flattenParams) ------------------


def flatten_params(p) -> jnp.ndarray:
    """Flatten a parameter tree (or node) into a single R^n vector.

    Ordering matches the reference: left-to-right over tree leaves, within a
    leaf the scale first then m0 ++ c0 [++ phi] [++ mu] ++ sigma
    (Parameters.scala:88-95, SdeParameters.scala:71,112,151).
    """
    flat, _ = ravel_pytree(p)
    return flat


def param_size(p) -> int:
    return int(flatten_params(p).shape[0])


def param_names(p: Tree) -> List[str]:
    """Reference: Parameters.scala:146-153."""
    if isinstance(p, Leaf):
        return p.value.names()
    if isinstance(p, Branch):
        return param_names(p.left) + param_names(p.right)
    if isinstance(p, ParamNode):
        return p.names()
    return []


def add_flat(p, delta: jnp.ndarray):
    """Add a flat innovation vector to a structured parameter tree.

    This is the reference ``Addable`` typeclass (Addable.scala:8-10,
    Parameters.scala:97-103): the bridge letting MCMC propose in flat R^n.
    """
    flat, unravel = ravel_pytree(p)
    return unravel(flat + delta)


# -- proposals (reference Parameters.scala:60-123) ----------------------------


def propose_identity(key, p):
    return p


def perturb(delta: float):
    """iid Gaussian random-walk proposal with variance ``delta`` per entry.

    Reference: Parameters.scala:65-67.
    Returns ``proposal(key, params) -> params``.
    """
    sd = jnp.sqrt(delta)

    def proposal(key, p):
        flat, unravel = ravel_pytree(p)
        return unravel(flat + sd * jax.random.normal(key, flat.shape, flat.dtype))

    return proposal


def perturb_mvn(chol: jnp.ndarray):
    """Correlated Gaussian proposal from a Cholesky factor.

    Reference: Parameters.scala:111-114.
    """
    chol = jnp.asarray(chol)

    def proposal(key, p):
        flat, unravel = ravel_pytree(p)
        z = jax.random.normal(key, (chol.shape[-1],), flat.dtype)
        return unravel(flat + chol @ z)

    return proposal


def perturb_mvn_eigen(cov: jnp.ndarray):
    """Correlated Gaussian proposal via eigendecomposition, robust to
    semi-definite covariances.  Reference: Parameters.scala:116-123,
    MultivariateNormalEigen.scala:11-23.
    """
    cov = jnp.asarray(cov)
    evals, evecs = jnp.linalg.eigh(cov)
    q = evecs * jnp.sqrt(jnp.clip(evals, 0.0, None))[None, :]

    def proposal(key, p):
        flat, unravel = ravel_pytree(p)
        z = jax.random.normal(key, (q.shape[-1],), flat.dtype)
        return unravel(flat + q @ z)

    return proposal


# -- posterior-sample statistics (reference Parameters.scala:53-58,135-139,
#    Utilities.scala:11-18) ----------------------------------------------------


def mean_params(samples):
    """Mean of a stacked parameter pytree (leading sample axis)."""
    return jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0), samples)


def stack_flat(samples) -> jnp.ndarray:
    """Stacked pytree (leading axis n) -> [n, d] matrix of flat vectors."""
    leaves = jax.tree_util.tree_leaves(samples)
    n = leaves[0].shape[0]
    return jax.vmap(lambda i: ravel_pytree(
        jax.tree_util.tree_map(lambda x: x[i], samples))[0])(jnp.arange(n))


def covariance_params(samples) -> jnp.ndarray:
    """Covariance matrix of a stacked parameter pytree.

    Reference: Parameters.scala:135-139 + Utilities.scala:11-18; feeds the
    adaptive MVN proposals.
    """
    m = stack_flat(samples)
    return jnp.cov(m, rowvar=False)
