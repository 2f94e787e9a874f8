"""Optimizer with exact PyTorch-SGD parity and the reference's per-parameter
weight-decay table.

Reference (main.py:301-322): every parameter gets SGD momentum 0.9 + nesterov
with weight decay
    1e-3  if 'Linear_weight' in the parameter name,
    0.0   if 'Mask' in the parameter name,
    1e-4  otherwise (including biases and BN params — the reference computes a
          `decay_mult` for biases but torch SGD ignores unknown keys, so the
          *effective* behavior is plain 1e-4; we replicate behavior, not
          intent).

PyTorch SGD update (replicated exactly, incl. first-step behavior):
    d = grad + wd * p
    buf = momentum * buf + d          (buf initialized to d on first step)
    d = d + momentum * buf            (nesterov)
    p = p - lr * d

The LR schedule is step-decay with optional linear warmup applied per *epoch*
(reference: main.py:342-353).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


class SGDState(NamedTuple):
    momentum_buf: Any       # pytree like params; None leaves before first step
    initialized: jax.Array  # bool scalar — torch initializes buf to d_p on step 1


def weight_decay_for_path(path: Tuple[str, ...]) -> float:
    """The reference's effective per-parameter weight decay (main.py:307-317)."""
    name = ".".join(str(p) for p in path)
    if "Linear_weight" in name:
        return 1e-3
    if "Mask" in name:
        return 0.0
    return 1e-4


def build_weight_decay_tree(params: Any) -> Any:
    """Pytree of per-leaf weight-decay scalars keyed off state-dict paths."""

    def _wd(path, leaf):
        keys = tuple(
            getattr(k, "key", getattr(k, "idx", None)) for k in path)
        return jnp.asarray(weight_decay_for_path(keys), dtype=leaf.dtype)

    return jax.tree_util.tree_map_with_path(_wd, params)


def init_sgd(params: Any) -> SGDState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return SGDState(momentum_buf=zeros,
                    initialized=jnp.asarray(False))


def sgd_update(
    params: Any,
    grads: Any,
    opt_state: SGDState,
    lr: jax.Array,
    wd_tree: Any,
    *,
    momentum: float = 0.9,
    nesterov: bool = True,
) -> Tuple[Any, SGDState]:
    """One PyTorch-parity SGD step. `lr` may be a traced scalar."""
    first = jnp.logical_not(opt_state.initialized)

    def leaf_update(p, g, buf, wd):
        d = g + wd * p
        new_buf = jnp.where(first, d, momentum * buf + d)
        step = d + momentum * new_buf if nesterov else new_buf
        return p - lr * step, new_buf

    flat = jax.tree_util.tree_map(
        leaf_update, params, grads, opt_state.momentum_buf, wd_tree)
    new_params = jax.tree_util.tree_map(
        lambda pair: pair[0], flat, is_leaf=lambda x: isinstance(x, tuple))
    new_buf = jax.tree_util.tree_map(
        lambda pair: pair[1], flat, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, SGDState(momentum_buf=new_buf,
                                initialized=jnp.asarray(True))


def step_decay_lr(
    epoch: int,
    base_lr: float,
    steps: Sequence[int],
    warm_up_epoch: int = 0,
) -> float:
    """Per-epoch LR (reference: main.py:342-353)."""
    if epoch < warm_up_epoch:
        return base_lr * (epoch + 1) / warm_up_epoch
    passed = sum(1 for s in steps if epoch >= s)
    return base_lr * (0.1 ** passed)
