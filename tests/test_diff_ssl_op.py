"""Differential parity: the SSL PredFutureFeat op vs the ACTUAL reference.

Runs the genuine `func.train_eval_ops.PredFutureFeat` (reference
func/train_eval_ops.py:148-231) against `make_ssl_train_step` on identical
inputs and weights, pinning the surfaces that op actually executes:

  * the [obs, future_0, ..., future_{n-1}] batch-dim concat + single forward
    (train_eval_ops.py:181-193)
  * slicing the observed half back out of every output (:195)
  * aux-loss merge over the FULL (obs+future) batch (:200)
  * per-future 'separately' reg losses + torch.min/mean combine (:204-221),
    incl. the `cumulative_future` running-mean (cumsum over the BATCH dim,
    :209-216 — a quirk kept verbatim)
  * 'together' MIL-style reshape (-1, B, C).transpose(0, 1) (:222-227)
  * gradients of the weighted total w.r.t. the model weights

The reference op's classification branch CANNOT execute as written: it calls
`self.cls_loss_acc_fn(outputs, target)` with two args while
BasicLossAccuracy.forward takes three (train_eval_ops.py:45,199), and then
reads `losses['cls']` (:201) — a key neither BasicLossAccuracy (`cls_<task>`)
nor NoLossAccuracy ({}) produces. No shipped expt uses this op, so the bug is
latent upstream. The test stubs that branch out on the reference side (zero
'cls') and runs avt_tpu with use_cls_loss=False; the cls path itself is
diff-pinned separately in test_diff_reference.py::test_basic_loss_accuracy*.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp
import optax

import ref_harness

from avt_tpu.losses import NormedMSE, SimclrInfoNCE
from avt_tpu.train.step import TrainState, make_ssl_train_step

ref_ops = ref_harness.import_ref("func.train_eval_ops")
ref_nce = ref_harness.import_ref("loss_fn.simclr_infonce")

RNG = np.random.default_rng(21)

B, D, C, NFUT = 4, 10, 6, 2
LOSS_WTS = {"reg": 0.7, "feat": 0.3}


class _RefModel(nn.Module):
    """Deterministic stand-in backbone: two linear heads + a scalar aux."""

    def __init__(self, wp, wf):
        super().__init__()
        self.wp = nn.Parameter(torch.from_numpy(wp))
        self.wf = nn.Parameter(torch.from_numpy(wf))

    def forward(self, video, target_shape=None):
        out = {
            "temp_agg_projected": video @ self.wp,
            "future_projected": video @ self.wf,
        }
        aux = {"feat": (video ** 2).mean() * 0.5}
        return out, aux


class _StubFlaxModel:
    """Same math as _RefModel behind the flax-style .apply contract."""

    def apply(self, params, video, train, rngs):
        out = {
            "temp_agg_projected": video @ params["wp"],
            "future_projected": video @ params["wf"],
        }
        aux = {"feat": jnp.mean(video ** 2) * 0.5}
        return out, aux


def _run_reference(batch_np, wp, wf, reg_criterion_conf, incur_loss_style,
                   combine_target, cumulative_future):
    model = _RefModel(wp.copy(), wf.copy())
    op = ref_ops.PredFutureFeat(
        model, "cpu", None,
        cls_loss_acc_fn={"_target_": "func.train_eval_ops.NoLossAccuracy"},
        reg_criterion=reg_criterion_conf,
        incur_loss_style=incur_loss_style,
        combine_future_losses={"_target_": combine_target},
        cumulative_future=cumulative_future,
    )
    # Stub the un-executable classification branch (see module docstring).
    op.cls_loss_acc_fn = lambda outputs, target: (
        {"cls": torch.zeros(())}, {})
    data = {
        "video": torch.from_numpy(batch_np["video"]),
        "target": {"verb": torch.from_numpy(batch_np["verb"])},
    }
    for i in range(NFUT):
        data[f"future_{i}_video"] = torch.from_numpy(
            batch_np[f"future_{i}_video"])
    _, _, losses, _ = op(data, train_mode=True)
    total = sum(LOSS_WTS[k] * losses[k].mean() for k in LOSS_WTS)
    total.backward()
    return (
        {k: losses[k].detach().numpy().mean() for k in LOSS_WTS},
        float(total.detach()),
        {"wp": model.wp.grad.numpy(), "wf": model.wf.grad.numpy()},
    )


def _run_avt(batch_np, wp, wf, reg_criterion, incur_loss_style,
             combine_future_losses, cumulative_future):
    params = {"wp": jnp.asarray(wp), "wf": jnp.asarray(wf)}
    # sgd(1.0) makes params - new_params == the raw gradient
    tx = optax.sgd(1.0)
    step = make_ssl_train_step(
        _StubFlaxModel(), tx, LOSS_WTS, num_classes={"verb": 5},
        reg_criterion=reg_criterion, nfutures=NFUT,
        incur_loss_style=incur_loss_style,
        combine_future_losses=combine_future_losses,
        cumulative_future=cumulative_future,
        use_cls_loss=False, jit_compile=False,
    )
    batch = {
        "video": jnp.asarray(batch_np["video"]),
        "target": {"verb": jnp.asarray(batch_np["verb"])},
    }
    for i in range(NFUT):
        batch[f"future_{i}_video"] = jnp.asarray(
            batch_np[f"future_{i}_video"])
    state = TrainState.create(params, tx)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    grads = jax.tree.map(lambda a, b: np.asarray(a - b),
                         params, new_state.params)
    return (
        {k: float(metrics[f"loss/{k}"]) for k in LOSS_WTS},
        float(metrics["loss"]),
        grads,
    )


def _make_batch():
    batch = {
        "video": RNG.normal(size=(B, D)).astype(np.float32),
        "verb": RNG.integers(0, 5, size=(B,)),
    }
    for i in range(NFUT):
        batch[f"future_{i}_video"] = RNG.normal(
            size=(B, D)).astype(np.float32)
    return batch


@pytest.mark.parametrize("combine,cumulative", [
    ("min", False),   # the shipped conf/train_eval_op/pred_future_feat.yaml
    ("mean", True),   # cumulative running-mean futures variant
])
def test_pred_future_feat_separately_vs_reference(combine, cumulative):
    batch = _make_batch()
    wp = RNG.normal(size=(D, C)).astype(np.float32) * 0.3
    wf = RNG.normal(size=(D, C)).astype(np.float32) * 0.3
    want_losses, want_total, want_grads = _run_reference(
        batch, wp, wf, {"_target_": "loss_fn.mse.NormedMSE"},
        "separately", f"torch.{combine}", cumulative,
    )
    got_losses, got_total, got_grads = _run_avt(
        batch, wp, wf, NormedMSE(), "separately", combine, cumulative,
    )
    for k in LOSS_WTS:
        np.testing.assert_allclose(
            got_losses[k], want_losses[k], rtol=1e-5, atol=1e-6,
            err_msg=f"loss {k}")
    np.testing.assert_allclose(got_total, want_total, rtol=1e-5, atol=1e-6)
    for k in ("wp", "wf"):
        np.testing.assert_allclose(
            got_grads[k], want_grads[k], rtol=1e-4, atol=1e-6,
            err_msg=f"grad {k}")


@pytest.mark.parametrize("mil_type", ["sum", "max"])
def test_pred_future_feat_together_vs_reference(mil_type):
    batch = _make_batch()
    wp = RNG.normal(size=(D, C)).astype(np.float32) * 0.3
    wf = RNG.normal(size=(D, C)).astype(np.float32) * 0.3
    want_losses, want_total, want_grads = _run_reference(
        batch, wp, wf,
        {"_target_": "loss_fn.simclr_infonce.DistributedSimclrInfoNCELoss",
         "temperature": 0.1, "mil_type": mil_type},
        "together", "torch.min", False,
    )
    got_losses, got_total, got_grads = _run_avt(
        batch, wp, wf,
        SimclrInfoNCE(temperature=0.1, mil_type=mil_type, axis_name=None),
        "together", "min", False,
    )
    for k in LOSS_WTS:
        np.testing.assert_allclose(
            got_losses[k], want_losses[k], rtol=1e-4, atol=1e-5,
            err_msg=f"loss {k}")
    np.testing.assert_allclose(got_total, want_total, rtol=1e-4, atol=1e-5)
    for k in ("wp", "wf"):
        np.testing.assert_allclose(
            got_grads[k], want_grads[k], rtol=1e-3, atol=1e-5,
            err_msg=f"grad {k}")
