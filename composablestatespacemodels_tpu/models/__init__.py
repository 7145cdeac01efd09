from . import bijectors, observation, params, sde, tree
from .model import (ComposedModel, FirstElement, Fourier, LeafModel, Model,
                    bernoulli, beta, compose, lgcp, linear, negative_binomial,
                    poisson, seasonal, students_t, zero_inflated_poisson)
from .params import (BrownianParams, GenBrownianParams, OuParams, ParamNode,
                     add_flat, brownian_params, covariance_params,
                     flatten_params, gen_brownian_params, mean_params,
                     ou_params, param_names, param_node, param_repeat,
                     param_size, parameters, perturb, perturb_mvn,
                     perturb_mvn_eigen)
from .sde import (Brownian, CompositeSde, GenBrownian, Ou, Sde,
                  brownian_motion, compose_sde, gen_brownian_motion,
                  ou_process)
from .tree import Branch, Empty, Leaf, Tree, branch, construct_tree_left, leaf

__all__ = [
    "bijectors", "observation", "params", "sde", "tree",
    "Model", "LeafModel", "ComposedModel", "FirstElement", "Fourier",
    "poisson", "linear", "seasonal", "students_t", "bernoulli", "beta",
    "negative_binomial", "zero_inflated_poisson", "lgcp", "compose",
    "BrownianParams", "GenBrownianParams", "OuParams", "ParamNode",
    "brownian_params", "gen_brownian_params", "ou_params", "param_node",
    "parameters", "param_repeat", "flatten_params", "param_size",
    "param_names", "add_flat", "perturb", "perturb_mvn", "perturb_mvn_eigen",
    "mean_params", "covariance_params",
    "Sde", "Brownian", "GenBrownian", "Ou", "CompositeSde",
    "brownian_motion", "gen_brownian_motion", "ou_process", "compose_sde",
    "Tree", "Leaf", "Branch", "Empty", "leaf", "branch",
    "construct_tree_left",
]
