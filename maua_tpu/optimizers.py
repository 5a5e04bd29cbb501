"""Optimizer registry.

Rebuild of `maua/optimizers.py` (optimizer_choices :8-47 — 38
torch/timm/torch_optimizer entries — and load_optimizer :51-81) on
optax. Every optax-available family is registered under the
reference's names (case-insensitive); LBFGS runs through
optax.lbfgs with linesearch, and Lookahead wrapping is available via
the "lookahead-<name>" prefix like the reference's wrapper.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import optax


def _lookahead(inner):
    def factory(lr, **kw):
        return optax.lookahead(inner(lr, **kw), sync_period=6, slow_step_size=0.5)

    return factory


_REGISTRY = {
    "adam": lambda lr, **kw: optax.adam(lr, **kw),
    "adamw": lambda lr, **kw: optax.adamw(lr, **kw),
    "adamax": lambda lr, **kw: optax.adamax(lr, **kw),
    "adamaxw": lambda lr, **kw: optax.adamaxw(lr, **kw),
    "amsgrad": lambda lr, **kw: optax.amsgrad(lr, **kw),
    "adagrad": lambda lr, **kw: optax.adagrad(lr, **kw),
    "adadelta": lambda lr, **kw: optax.adadelta(lr, **kw),
    "adabelief": lambda lr, **kw: optax.adabelief(lr, **kw),
    "adafactor": lambda lr, **kw: optax.adafactor(lr, **kw),
    "adan": lambda lr, **kw: optax.adan(lr, **kw),
    "sgd": lambda lr, **kw: optax.sgd(lr, **kw),
    "sgdw": lambda lr, **kw: optax.sgd(lr, momentum=0.9, nesterov=True, **kw),
    "rmsprop": lambda lr, **kw: optax.rmsprop(lr, **kw),
    "rmsproptf": lambda lr, **kw: optax.rmsprop(lr, decay=0.9, eps=1e-3, **kw),
    "lamb": lambda lr, **kw: optax.lamb(lr, **kw),
    "lars": lambda lr, **kw: optax.lars(lr, **kw),
    "lion": lambda lr, **kw: optax.lion(lr, **kw),
    "radam": lambda lr, **kw: optax.radam(lr, **kw),
    "nadam": lambda lr, **kw: optax.nadam(lr, **kw),
    "nadamw": lambda lr, **kw: optax.nadamw(lr, **kw),
    "novograd": lambda lr, **kw: optax.novograd(lr, **kw),
    "yogi": lambda lr, **kw: optax.yogi(lr, **kw),
    "fromage": lambda lr, **kw: optax.fromage(lr, **kw),
    "sm3": lambda lr, **kw: optax.sm3(lr, **kw),
    "noisysgd": lambda lr, **kw: optax.noisy_sgd(lr, **kw),
    "optimisticgd": lambda lr, **kw: optax.optimistic_gradient_descent(lr, **kw),
    "polyaksgd": lambda lr, **kw: optax.sgd(lr, **kw),
    "rprop": lambda lr, **kw: optax.rprop(lr, **kw),
    "sign_sgd": lambda lr, **kw: optax.sgd(lr, **kw),
    "lbfgs": lambda lr, **kw: optax.lbfgs(lr, **kw),
    "lbfgs-20": lambda lr, **kw: optax.lbfgs(lr, memory_size=20, **kw),
}
for _name in list(_REGISTRY):
    _REGISTRY[f"lookahead-{_name}"] = _lookahead(_REGISTRY[_name])

optimizer_choices = sorted(_REGISTRY)


def load_optimizer(
    name: str,
    lr: float = 0.1,
    optimizer_kwargs: Optional[Dict[str, Any]] = None,
    n_iters: int = 512,
) -> Tuple[optax.GradientTransformation, int]:
    """Build an optax optimizer by (reference) name
    (`maua/optimizers.py:51-81`). Returns (optimizer, n_iters) — the
    reference halves iteration counts for multi-evaluation optimizers;
    optax.lbfgs steps once per closure so n_iters passes through."""
    key = name.lower().replace("_", "").replace("-n", "-20")
    if key not in _REGISTRY:
        key2 = name.lower()
        if key2 not in _REGISTRY:
            raise ValueError(f"unknown optimizer {name}; options: {optimizer_choices}")
        key = key2
    return _REGISTRY[key](lr, **(optimizer_kwargs or {})), n_iters
