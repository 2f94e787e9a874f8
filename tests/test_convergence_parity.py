"""To-convergence statistical parity vs the torch reference-loop oracle
(VERDICT r4 task 4) — the last accuracy rung reachable without the real
dataset.

tests/test_trajectory_parity.py proves per-step exactness and
lockstep-to-the-first-dither-tie plus a 60-step envelope.  This module
extends the claim to the quantity users care about: both implementations
are trained TO PLATEAU (600 steps, 20 epochs with the reference
two-stage LR decay, main.py:342-353) on a NON-separable synthetic task
(weak overlapping class signal + 20% label noise, so the Bayes-optimal
accuracy is well below 1.0 and "memorize the training set" cannot mask a
numerics bug), and the final HELD-OUT eval accuracies — torch
model.eval() running stats vs the jax training=False path — must agree
within a stated band, fp32 and bf16.  Measured r5 (scratch/conv_probe):
torch 0.502, jax fp32 0.531, jax bf16 0.537 on the 512-sample eval set;
plateau losses within 0.008.  Recorded in docs/PARITY.md.

The torch side IS the reference loop: the oracle model/optimizer/shift
autograd from test_trajectory_parity (reference model/shift_gcn.py:31-216,
shift_cuda_kernel.cu:277-395, main.py:301-322).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from shift_gcn_tpu.models.shift_gcn import init_params
from shift_gcn_tpu.train import state as state_lib
from shift_gcn_tpu.train.optim import build_weight_decay_tree, step_decay_lr

from test_trajectory_parity import (
    _CONFIG,
    _TorchModel,
    _load_from_pytree,
    _reference_optimizer,
)

_N_TRAIN = 240
_N_EVAL = 512
_BATCH = 8
_EPOCHS = 20
_STEPS_PER_EPOCH = _N_TRAIN // _BATCH          # 30 -> 600 steps total
_BASE_LR = 0.1
_LR_STEPS = [12, 16]
_WARMUP = 1
_LABEL_NOISE = 0.2


def _make_dataset(n, seed):
    """Overlapping weak class clusters + label noise: NOT separable.

    The class signal is learnable but 20% of labels are resampled
    uniformly — the Bayes-optimal eval accuracy is ~0.84, so a plateau
    at 1.0 would itself be a bug, and the interesting statistic is
    where the two implementations' plateaus land relative to each
    other (eval set is 512 samples: the binomial std of the accuracy
    estimate is ~2%, so the asserted bands measure numerics, not
    estimator noise)."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, 3, 12, 25, 2)).astype(np.float32)
    y = rng.integers(0, 5, n)
    for i in range(n):
        x[i, y[i] % 3] += 0.25 * (y[i] + 1) / 5.0
    flip = rng.random(n) < _LABEL_NOISE
    y[flip] = rng.integers(0, 5, int(flip.sum()))
    return x, y.astype(np.int32)


def _epoch_batches(x, y, epoch, seed=17):
    rng = np.random.default_rng(seed + epoch)
    order = rng.permutation(len(x))
    for b in range(_STEPS_PER_EPOCH):
        idx = order[b * _BATCH:(b + 1) * _BATCH]
        yield x[idx], y[idx]


def _lr_for(epoch):
    return step_decay_lr(epoch, _BASE_LR, _LR_STEPS, _WARMUP)


def _run_torch_to_plateau(params_np, state_np, xtr, ytr, xev, yev):
    torch.manual_seed(0)
    model = _TorchModel(_CONFIG)
    _load_from_pytree(model, params_np, state_np)
    opt = _reference_optimizer(model)
    losses = []
    for epoch in range(_EPOCHS):
        model.train()
        for g in opt.param_groups:
            g["lr"] = _lr_for(epoch)
        for xb, yb in _epoch_batches(xtr, ytr, epoch):
            loss = F.cross_entropy(model(torch.as_tensor(xb)),
                                   torch.as_tensor(yb).long())
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
    model.eval()
    with torch.no_grad():
        logits = model(torch.as_tensor(xev))
    acc = float((logits.argmax(-1).numpy() == yev).mean())
    return np.asarray(losses), acc


def _run_jax_to_plateau(config, xtr, ytr, xev, yev, seed=11):
    params, bn_state = init_params(jax.random.key(seed), config)
    state = state_lib.TrainState(
        params=params, bn_state=bn_state,
        opt_state=state_lib.init_sgd(params),
        global_step=jnp.zeros((), jnp.int32))
    wd_tree = build_weight_decay_tree(params)
    step_fn = jax.jit(state_lib.make_train_step(config, wd_tree))
    eval_fn = jax.jit(state_lib.make_eval_step(config))
    losses = []
    for epoch in range(_EPOCHS):
        lr = jnp.asarray(_lr_for(epoch), jnp.float32)
        for xb, yb in _epoch_batches(xtr, ytr, epoch):
            state, metrics = step_fn(
                state, {"data": jnp.asarray(xb),
                        "label": jnp.asarray(yb)}, lr)
            losses.append(float(metrics["loss"]))
    logits, _, _ = eval_fn(state.params, state.bn_state,
                           {"data": jnp.asarray(xev),
                            "label": jnp.asarray(yev)})
    acc = float((np.asarray(logits).argmax(-1) == yev).mean())
    return np.asarray(losses), acc


@pytest.fixture(scope="module")
def plateau():
    xtr, ytr = _make_dataset(_N_TRAIN, seed=23)
    xev, yev = _make_dataset(_N_EVAL, seed=29)
    params, bn_state = init_params(jax.random.key(11), _CONFIG)
    params_np = jax.tree_util.tree_map(np.asarray, params)
    state_np = jax.tree_util.tree_map(np.asarray, bn_state)
    tlosses, tacc = _run_torch_to_plateau(params_np, state_np,
                                          xtr, ytr, xev, yev)
    jlosses, jacc = _run_jax_to_plateau(_CONFIG, xtr, ytr, xev, yev)
    return xtr, ytr, xev, yev, tlosses, tacc, jlosses, jacc


@pytest.mark.slow
def test_task_is_genuinely_nonseparable(plateau):
    """Both plateaus must sit clearly below 1.0 eval accuracy — the task
    has irreducible label noise, so perfect accuracy would mean the
    harness degenerated into a separable memorization check."""
    *_, tacc, _, jacc = plateau
    assert tacc < 0.95 and jacc < 0.95, (tacc, jacc)
    # and both genuinely learned (5 classes -> 0.2 chance)
    assert tacc > 0.4 and jacc > 0.4, (tacc, jacc)


@pytest.mark.slow
def test_final_eval_accuracy_agrees_fp32(plateau):
    """The headline claim: after 600 steps to plateau, the held-out eval
    accuracies agree within 0.06 (measured r5: torch 0.502 vs jax
    0.531, |diff| 0.029 on the 512-sample set whose binomial std is
    ~0.022 — the band is ~2x the measured gap, covering dither-path
    resampling; docs/PARITY.md)."""
    *_, tacc, _, jacc = plateau
    assert abs(tacc - jacc) <= 0.06, (tacc, jacc)


@pytest.mark.slow
def test_loss_plateaus_agree_fp32(plateau):
    """Same descent and the same plateau level: final-epoch mean losses
    within 0.1 (measured 0.008) and both well below the first-epoch
    mean."""
    *_, tlosses, _, jlosses, _ = plateau
    t_first = tlosses[:_STEPS_PER_EPOCH].mean()
    t_last = tlosses[-_STEPS_PER_EPOCH:].mean()
    j_last = jlosses[-_STEPS_PER_EPOCH:].mean()
    assert abs(t_last - j_last) < 0.1, (t_last, j_last)
    assert t_last < 0.7 * t_first
    assert j_last < 0.7 * t_first


@pytest.mark.slow
def test_final_eval_accuracy_agrees_bf16(plateau):
    """The production bf16-activation config reaches the same plateau:
    eval accuracy within 0.07 of the fp32 torch oracle (measured r5:
    0.537 vs 0.502, |diff| 0.035 — looser band for the extra
    rounding-driven dither resampling)."""
    import dataclasses

    xtr, ytr, xev, yev, _, tacc, _, _ = plateau
    config = dataclasses.replace(_CONFIG, activation_dtype="bfloat16")
    jlosses, jacc = _run_jax_to_plateau(config, xtr, ytr, xev, yev)
    assert abs(tacc - jacc) <= 0.07, (tacc, jacc)
    assert jlosses[-_STEPS_PER_EPOCH:].mean() < 0.7 * (
        jlosses[:_STEPS_PER_EPOCH].mean())
