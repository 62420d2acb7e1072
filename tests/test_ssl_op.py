"""SSL (PredFutureFeat) train step tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avt_tpu.losses import NormedMSE, SimclrInfoNCE, normed_mse
from avt_tpu.models import (
    AVTModel,
    IdentityBackbone,
    IdentityFuture,
    LinearClassifier,
    MeanAgg,
)
from avt_tpu.models.temporal_agg import IdentityAgg
from avt_tpu.train import TrainState, build_optimizer
from avt_tpu.train.step import make_ssl_train_step

RNG = np.random.default_rng(7)
C, N_CLS, B, T = 32, 5, 4, 6


def _model(project_dim=16):
    return AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=MeanAgg(in_features=C),
        future_predictor=IdentityFuture(in_features=C),
        temporal_aggregator_after_future_pred=IdentityAgg(in_features=C),
        classifiers={"action": LinearClassifier(out_features=N_CLS)},
        num_classes=(("action", N_CLS),),
        backbone_dim=C,
        project_dim_for_nce=project_dim,
    )


def _batch(nfutures=2):
    batch = {
        "video": jnp.asarray(
            RNG.normal(size=(B, 1, C, T, 1, 1)).astype(np.float32)
        ),
        "target": {"action": jnp.asarray(RNG.integers(0, N_CLS, size=(B,)))},
    }
    for i in range(nfutures):
        batch[f"future_{i}_video"] = jnp.asarray(
            RNG.normal(size=(B, 1, C, T, 1, 1)).astype(np.float32)
        )
    return batch


@pytest.mark.parametrize("style,criterion", [
    ("separately", NormedMSE()),
    ("together", SimclrInfoNCE()),
])
def test_ssl_step_runs_and_learns(style, criterion):
    model = _model()
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), batch["video"])
    tx, _ = build_optimizer(
        params, lr_wd=[["__all__", 0.05, 0.0]],
        optimizer_name="sgd", scheduler_name="constant",
        iters_per_epoch=10, num_epochs=1,
    )
    step = make_ssl_train_step(
        model, tx,
        loss_wts={"cls_action": 1.0, "reg": 1.0},
        num_classes={"action": N_CLS},
        reg_criterion=criterion,
        nfutures=2,
        incur_loss_style=style,
        donate=False,
    )
    state = TrainState.create(params, tx)
    state, m0 = step(state, batch, jax.random.PRNGKey(1))
    assert "loss/reg" in m0 and np.isfinite(float(m0["loss/reg"]))
    for i in range(20):
        state, m = step(state, batch, jax.random.PRNGKey(i + 2))
    assert float(m["loss"]) < float(m0["loss"])


def test_ssl_separately_min_combination():
    """'separately' with min picks the closest future (reference default)."""
    model = _model()
    batch = _batch(nfutures=2)
    # future_1 == the observed video -> its reg loss must be the min
    batch["future_1_video"] = batch["video"]
    params = model.init(jax.random.PRNGKey(0), batch["video"])
    tx, _ = build_optimizer(
        params, lr_wd=[["__all__", 0.0, 0.0]],
        optimizer_name="sgd", scheduler_name="constant",
        iters_per_epoch=1, num_epochs=1,
    )
    step = make_ssl_train_step(
        model, tx, loss_wts={"cls_action": 0.0, "reg": 1.0},
        num_classes={"action": N_CLS}, reg_criterion=NormedMSE(),
        nfutures=2, donate=False,
    )
    state = TrainState.create(params, tx)
    _, m = step(state, batch, jax.random.PRNGKey(1))
    # identical clip -> identical projected feats -> reg loss == 0 (min)
    assert float(m["loss/reg"]) < 1e-10
