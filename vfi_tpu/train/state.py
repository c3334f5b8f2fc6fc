"""Train state + optimizer stack + ReduceLROnPlateau equivalent.

Optimizer of record (reference: train.py:82,128): AdamW(lr, weight_decay
1e-5) behind global-norm gradient clipping at 0.1, with a
reduce-on-plateau schedule (factor 0.5, patience 5; train.py:84).

TPU-first details:
- the learning rate is an optax injected hyperparameter, so the host-side
  plateau scheduler can update it between epochs without recompiling the
  jit'd train step;
- parameters stay float32; bf16 happens at activation compute inside the
  model (mixed-precision policy).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """Minimal jit-friendly train state (params + optimizer state + step)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads: Any) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def make_optimizer(learning_rate: float, weight_decay: float = 1e-5,
                   grad_clip_norm: float = 0.1) -> optax.GradientTransformation:
    """clip_by_global_norm(0.1) -> AdamW, lr injected for runtime updates."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, weight_decay=weight_decay
        ),
    )


def create_train_state(params: Any, learning_rate: float,
                       weight_decay: float = 1e-5,
                       grad_clip_norm: float = 0.1) -> TrainState:
    tx = make_optimizer(learning_rate, weight_decay, grad_clip_norm)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx)


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state[1].hyperparams["learning_rate"])


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Rewrite the injected lr inside opt_state (host-side, between epochs)."""
    inner = state.opt_state[1]
    hyper = dict(inner.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
    new_inner = inner._replace(hyperparams=hyper)
    return state.replace(opt_state=(state.opt_state[0], new_inner))


@dataclass
class PlateauScheduler:
    """Host-side ReduceLROnPlateau (torch semantics, mode='min').

    `step(val_loss)` returns the new lr (possibly reduced). Matches the
    reference's factor/patience config (train.py:84); min_lr/threshold are
    torch defaults.
    """

    lr: float
    factor: float = 0.5
    patience: int = 5
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: float = float("inf")
    num_bad: int = 0

    def step(self, val_loss: float) -> float:
        if val_loss < self.best * (1.0 - self.threshold):
            self.best = val_loss
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d: dict) -> None:
        self.lr = float(d["lr"])
        self.best = float(d["best"])
        self.num_bad = int(d["num_bad"])


@dataclass
class CosineScheduler:
    """Host-side cosine decay, optionally with warm restarts (SGDR-style).

    Same `step(val_loss)`/state_dict interface as PlateauScheduler so the
    Trainer/checkpoints treat both uniformly (val_loss is ignored; the
    schedule is epoch-clocked). `period` is the restart period in epochs;
    period == total gives a single cosine over the run. Quality lever for
    long runs where the reference's plateau schedule (noisy 15-step/epoch
    val loss, patience 5) decays the lr to its floor long before
    convergence (docs/PERFORMANCE.md round-1 training findings).
    """

    lr0: float
    total: int
    period: int = 0  # 0 -> single cosine over `total`; >0 -> warm restarts
    min_lr: float = 1e-5
    t: int = 0
    lr: float = 0.0
    restarts: bool = False

    def __post_init__(self):
        self.restarts = self.period > 0
        if self.period <= 0:
            self.period = max(self.total, 1)
        if self.lr == 0.0:
            self.lr = self.lr0

    def step(self, val_loss: float) -> float:  # noqa: ARG002 (interface)
        import math

        # called at epoch end: epoch e+1 runs at the cosine value for t=e+1
        self.t += 1
        if self.restarts:
            tc = self.t % self.period  # t == k*period -> back to lr0
        else:
            tc = min(self.t, self.period)  # anneal once, hold at min_lr
        self.lr = self.min_lr + 0.5 * (self.lr0 - self.min_lr) * (
            1.0 + math.cos(math.pi * tc / self.period))
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "t": self.t, "lr0": self.lr0,
                "period": self.period, "min_lr": self.min_lr}

    def load_state_dict(self, d: dict) -> None:
        # Only the CLOCK (t, lr) is checkpoint state. The schedule shape
        # (lr0/period/min_lr/restarts) is config-owned: restoring `period`
        # from the checkpoint while `restarts` came from the new config
        # mixed the two runs' semantics (e.g. old period=50 + new
        # cosine_restart_period=0 pinned the lr at min_lr via
        # tc=min(t,50)). state_dict still writes the shape keys so the
        # orbax meta schema — and old checkpoints — stay compatible.
        self.lr = float(d["lr"])
        self.t = int(d["t"])
