"""SGD parity vs torch.optim.SGD (momentum + nesterov + weight decay),
including the first-step momentum-buffer initialization."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from shift_gcn_tpu.train.optim import (
    build_weight_decay_tree, init_sgd, sgd_update, step_decay_lr)


def test_sgd_matches_torch_over_steps():
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((4, 3)).astype(np.float32)
    lr, wd = 0.1, 1e-4

    pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.SGD([pt], lr=lr, momentum=0.9, nesterov=True,
                          weight_decay=wd)

    params = {"w": jnp.asarray(p0)}
    wd_tree = {"w": jnp.asarray(wd)}
    opt_state = init_sgd(params)

    for step in range(5):
        g = rng.standard_normal((4, 3)).astype(np.float32)
        opt.zero_grad()
        pt.grad = torch.from_numpy(g.copy())
        opt.step()
        params, opt_state = sgd_update(
            params, {"w": jnp.asarray(g)}, opt_state,
            jnp.asarray(lr), wd_tree)
        np.testing.assert_allclose(
            np.asarray(params["w"]), pt.detach().numpy(), atol=1e-6,
            err_msg=f"diverged at step {step}")


def test_weight_decay_table():
    params = {
        "l1": {"gcn1": {"Linear_weight": jnp.zeros(3),
                        "Feature_Mask": jnp.zeros(3),
                        "Linear_bias": jnp.zeros(3)}},
        "fc": {"weight": jnp.zeros(3)},
    }
    wd = build_weight_decay_tree(params)
    assert float(wd["l1"]["gcn1"]["Linear_weight"]) == pytest.approx(1e-3)
    assert float(wd["l1"]["gcn1"]["Feature_Mask"]) == 0.0
    assert float(wd["l1"]["gcn1"]["Linear_bias"]) == pytest.approx(1e-4)
    assert float(wd["fc"]["weight"]) == pytest.approx(1e-4)


def test_step_decay_lr():
    # reference main.py:342-353 with steps [60, 80, 100]
    assert step_decay_lr(0, 0.1, [60, 80, 100]) == 0.1
    assert abs(step_decay_lr(60, 0.1, [60, 80, 100]) - 0.01) < 1e-12
    assert abs(step_decay_lr(100, 0.1, [60, 80, 100]) - 1e-4) < 1e-12
    # warmup
    assert abs(step_decay_lr(0, 0.1, [60], 5) - 0.02) < 1e-12
    assert abs(step_decay_lr(4, 0.1, [60], 5) - 0.1) < 1e-12
