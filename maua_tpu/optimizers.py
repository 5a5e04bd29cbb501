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


# ---------------------------------------------------------------------
# Custom transforms for reference optimizers optax lacks
# (`maua/optimizers.py:8-47` names from torch_optimizer /
# pytorch_optimizer / timm). Each is the published update rule, not an
# alias.
import jax
import jax.numpy as jnp


def _adam_moments(b1, b2):
    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"m": z, "v": jax.tree_util.tree_map(jnp.zeros_like, params), "count": jnp.zeros((), jnp.int32)}

    def moments(grads, state):
        count = state["count"] + 1
        m = jax.tree_util.tree_map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = jax.tree_util.tree_map(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state["v"], grads)
        c = count.astype(jnp.float32)
        mhat = jax.tree_util.tree_map(lambda m_: m_ / (1 - b1**c), m)
        vhat = jax.tree_util.tree_map(lambda v_: v_ / (1 - b2**c), v)
        return m, v, mhat, vhat, count

    return init, moments


def adabound(lr: float = 1e-3, final_lr: float = 0.1, b1: float = 0.9, b2: float = 0.999,
             gamma: float = 1e-3, eps: float = 1e-8) -> optax.GradientTransformation:
    """AdaBound (Luo et al. 2019): Adam with the per-element step size
    clipped into a band converging to final_lr (torch_optimizer.AdaBound)."""
    init_m, moments = _adam_moments(b1, b2)

    def update(grads, state, params=None):
        m, v, mhat, vhat, count = moments(grads, state)
        t = count.astype(jnp.float32)
        lower = final_lr * (1 - 1 / (gamma * t + 1))
        upper = final_lr * (1 + 1 / (gamma * t))

        def u(mh, vh):
            step = jnp.clip(lr / (jnp.sqrt(vh) + eps), lower, upper)
            return -step * mh

        return jax.tree_util.tree_map(u, mhat, vhat), {"m": m, "v": v, "count": count}

    return optax.GradientTransformation(lambda p: _adam_moments(b1, b2)[0](p), update)


def adamod(lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999, b3: float = 0.999,
           eps: float = 1e-8) -> optax.GradientTransformation:
    """AdaMod (Ding et al. 2019): Adam with an exponential long-term
    memory bound on the adaptive learning rate."""
    init_m, moments = _adam_moments(b1, b2)

    def init(params):
        s = init_m(params)
        s["s"] = jax.tree_util.tree_map(jnp.zeros_like, params)
        return s

    def update(grads, state, params=None):
        m, v, mhat, vhat, count = moments(grads, state)

        def u(mh, vh, s_):
            eta = lr / (jnp.sqrt(vh) + eps)
            s_new = b3 * s_ + (1 - b3) * eta
            return -jnp.minimum(eta, s_new) * mh, s_new

        flat_out = jax.tree_util.tree_map(u, mhat, vhat, state["s"])
        steps = jax.tree_util.tree_map(lambda o: o[0], flat_out, is_leaf=lambda x: isinstance(x, tuple))
        s = jax.tree_util.tree_map(lambda o: o[1], flat_out, is_leaf=lambda x: isinstance(x, tuple))
        return steps, {"m": m, "v": v, "count": count, "s": s}

    return optax.GradientTransformation(init, update)


def diffgrad(lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8) -> optax.GradientTransformation:
    """diffGrad (Dubey et al. 2019): Adam step scaled by
    sigmoid(|g_prev - g|) friction."""
    init_m, moments = _adam_moments(b1, b2)

    def init(params):
        s = init_m(params)
        s["prev_g"] = jax.tree_util.tree_map(jnp.zeros_like, params)
        return s

    def update(grads, state, params=None):
        m, v, mhat, vhat, count = moments(grads, state)

        def u(mh, vh, g, pg):
            xi = jax.nn.sigmoid(jnp.abs(pg - g))
            return -lr * xi * mh / (jnp.sqrt(vh) + eps)

        steps = jax.tree_util.tree_map(u, mhat, vhat, grads, state["prev_g"])
        return steps, {"m": m, "v": v, "count": count, "prev_g": grads}

    return optax.GradientTransformation(init, update)


def qhm(lr: float = 1e-3, b: float = 0.999, nu: float = 0.7) -> optax.GradientTransformation:
    """Quasi-hyperbolic momentum (Ma & Yarats 2019)."""

    def init(params):
        return {"m": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update(grads, state, params=None):
        m = jax.tree_util.tree_map(lambda m_, g: b * m_ + (1 - b) * g, state["m"], grads)
        steps = jax.tree_util.tree_map(lambda m_, g: -lr * (nu * m_ + (1 - nu) * g), m, grads)
        return steps, {"m": m}

    return optax.GradientTransformation(init, update)


def qhadam(lr: float = 1e-3, b1: float = 0.995, b2: float = 0.999, nu1: float = 0.7,
           nu2: float = 1.0, eps: float = 1e-8) -> optax.GradientTransformation:
    """QHAdam (Ma & Yarats 2019)."""
    init_m, moments = _adam_moments(b1, b2)

    def update(grads, state, params=None):
        m, v, mhat, vhat, count = moments(grads, state)

        def u(mh, vh, g):
            num = nu1 * mh + (1 - nu1) * g
            den = jnp.sqrt(nu2 * vh + (1 - nu2) * g * g) + eps
            return -lr * num / den

        return jax.tree_util.tree_map(u, mhat, vhat, grads), {"m": m, "v": v, "count": count}

    return optax.GradientTransformation(init_m, update)


def pid(lr: float = 1e-3, momentum: float = 0.9, integral: float = 5.0, derivative: float = 10.0) -> optax.GradientTransformation:
    """PID optimizer (An et al. 2018): P = grad, I = momentum buffer,
    D = grad difference."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"i": z, "prev_g": jax.tree_util.tree_map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        i_buf = jax.tree_util.tree_map(lambda i_, g: momentum * i_ + g, state["i"], grads)
        first = (state["count"] == 0).astype(jnp.float32)
        d_buf = jax.tree_util.tree_map(lambda g, pg: (1 - first) * (g - pg), grads, state["prev_g"])
        steps = jax.tree_util.tree_map(
            lambda g, i_, d: -lr * (g + integral * i_ + derivative * d), grads, i_buf, d_buf
        )
        return steps, {"i": i_buf, "prev_g": grads, "count": state["count"] + 1}

    return optax.GradientTransformation(init, update)


def aggmo(lr: float = 1e-3, betas=(0.0, 0.9, 0.99)) -> optax.GradientTransformation:
    """Aggregated momentum (Lucas et al. 2018): average of several
    momentum buffers with different betas."""

    def init(params):
        return {"m": [jax.tree_util.tree_map(jnp.zeros_like, params) for _ in betas]}

    def update(grads, state, params=None):
        ms = [
            jax.tree_util.tree_map(lambda m_, g: b * m_ + g, mb, grads)
            for b, mb in zip(betas, state["m"])
        ]
        k = float(len(betas))
        steps = jax.tree_util.tree_map(lambda *bufs: -lr / k * sum(bufs), *ms)
        return steps, {"m": ms}

    return optax.GradientTransformation(init, update)


def _project_radial(step, param, grad, eps=1e-8, delta=0.1):
    """AdamP/SGDP projection: remove the radial step component for
    scale-invariant parameters (cosine(g, p) below threshold)."""
    if param.ndim == 0:
        return step
    p_flat = param.reshape(-1)
    g_flat = grad.reshape(-1)
    p_n = p_flat / (jnp.linalg.norm(p_flat) + eps)
    cos = jnp.abs(jnp.dot(p_n, g_flat)) / (jnp.linalg.norm(g_flat) + eps)
    s_flat = step.reshape(-1)
    projected = s_flat - jnp.dot(s_flat, p_n) * p_n
    use_proj = cos < delta / jnp.sqrt(jnp.asarray(float(p_flat.shape[0])))
    return jnp.where(use_proj, projected, s_flat).reshape(step.shape)


def adamp(lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8) -> optax.GradientTransformation:
    """AdamP (Heo et al. 2021)."""
    init_m, moments = _adam_moments(b1, b2)

    def update(grads, state, params=None):
        m, v, mhat, vhat, count = moments(grads, state)
        steps = jax.tree_util.tree_map(lambda mh, vh: -lr * mh / (jnp.sqrt(vh) + eps), mhat, vhat)
        if params is not None:
            steps = jax.tree_util.tree_map(_project_radial, steps, params, grads)
        return steps, {"m": m, "v": v, "count": count}

    return optax.GradientTransformation(init_m, update)


def sgdp(lr: float = 1e-3, momentum: float = 0.9) -> optax.GradientTransformation:
    """SGDP (Heo et al. 2021)."""

    def init(params):
        return {"m": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update(grads, state, params=None):
        m = jax.tree_util.tree_map(lambda m_, g: momentum * m_ + g, state["m"], grads)
        steps = jax.tree_util.tree_map(lambda m_: -lr * m_, m)
        if params is not None:
            steps = jax.tree_util.tree_map(_project_radial, steps, params, grads)
        return steps, {"m": m}

    return optax.GradientTransformation(init, update)


def accsgd(lr: float = 1e-3, kappa: float = 1000.0, xi: float = 10.0, small_const: float = 0.7) -> optax.GradientTransformation:
    """AccSGD (Jain et al. 2018 / Kidambi et al. 2018)."""
    large = xi * small_const * small_const

    def init(params):
        return {"momentum": jax.tree_util.tree_map(lambda p: jnp.array(p), params)}

    def update(grads, state, params=None):
        alpha = 1.0 - large * large * small_const / kappa
        beta = 1.0 - alpha
        zeta = small_const / (small_const + beta)

        def u(g, mom, p):
            mom_new = alpha * mom + (1.0 - alpha) * (p - (kappa / large) * lr * g)
            p_new = zeta * (p - lr * g) + (1.0 - zeta) * mom_new
            return p_new - p, mom_new

        out = jax.tree_util.tree_map(u, grads, state["momentum"], params)
        steps = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        mom = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        return steps, {"momentum": mom}

    return optax.GradientTransformation(init, update)


def swats(lr: float = 1e-3, switch_step: int = 100, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8) -> optax.GradientTransformation:
    """SWATS (Keskar & Socher 2017), simplified: Adam for the first
    switch_step steps, SGD-with-momentum after."""
    init_m, moments = _adam_moments(b1, b2)

    def update(grads, state, params=None):
        m, v, mhat, vhat, count = moments(grads, state)
        use_adam = (count <= switch_step).astype(jnp.float32)
        steps = jax.tree_util.tree_map(
            lambda mh, vh, m_: -lr * (use_adam * mh / (jnp.sqrt(vh) + eps) + (1 - use_adam) * m_),
            mhat, vhat, m,
        )
        return steps, {"m": m, "v": v, "count": count}

    return optax.GradientTransformation(init_m, update)


def shampoo(lr: float = 1e-3, update_preconditioner_every: int = 1, eps: float = 1e-6,
            momentum: float = 0.9) -> optax.GradientTransformation:
    """Basic Shampoo (Gupta et al. 2018): left/right Kronecker
    preconditioners G_l^{-1/4} G G_r^{-1/4} for matrices, adagrad for
    other shapes."""

    def inv_quarter(M):
        w, U = jnp.linalg.eigh(M)
        return (U * jnp.power(jnp.clip(w, eps, None), -0.25)[None]) @ U.T

    def init(params):
        def s(p):
            if p.ndim == 2:
                return {"l": jnp.zeros((p.shape[0], p.shape[0])), "r": jnp.zeros((p.shape[1], p.shape[1])),
                        "m": jnp.zeros_like(p)}
            return {"acc": jnp.zeros_like(p), "m": jnp.zeros_like(p)}

        return jax.tree_util.tree_map(s, params)

    def update(grads, state, params=None):
        def u(g, s):
            if g.ndim == 2:
                l = s["l"] + g @ g.T
                r = s["r"] + g.T @ g
                pre = inv_quarter(l + eps * jnp.eye(l.shape[0])) @ g @ inv_quarter(r + eps * jnp.eye(r.shape[0]))
                m = momentum * s["m"] + pre
                return -lr * m, {"l": l, "r": r, "m": m}
            acc = s["acc"] + g * g
            m = momentum * s["m"] + g / (jnp.sqrt(acc) + eps)
            return -lr * m, {"acc": acc, "m": m}

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_s = treedef.flatten_up_to(state)
        out = [u(g, s) for g, s in zip(flat_g, flat_s)]
        return treedef.unflatten([o[0] for o in out]), treedef.unflatten([o[1] for o in out])

    return optax.GradientTransformation(init, update)


def adahessian_optimizer(loss_fn, lr: float = 0.1, b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-4, key=None):
    """AdaHessian (Yao et al. 2020) — needs Hessian information, which
    a grads-only GradientTransformation cannot see; this returns a
    (init_fn, step_fn(params, state, *loss_args)) pair computing the
    Hutchinson diagonal with a jvp-of-grad (free in JAX, unlike the
    reference's create_graph=True double backward)."""
    key = key if key is not None else jax.random.PRNGKey(0)

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"m": z, "v": jax.tree_util.tree_map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32), "key": key}

    def step(params, state, *args):
        k, sub = jax.random.split(state["key"])
        grads = jax.grad(loss_fn)(params, *args)
        # Hutchinson: D ~ z * (H z) with rademacher z
        flat, treedef = jax.tree_util.tree_flatten(params)
        zs = [jax.random.rademacher(jax.random.fold_in(sub, i), f.shape, dtype=jnp.float32) for i, f in enumerate(flat)]
        z_tree = treedef.unflatten(zs)
        _, hz = jax.jvp(lambda p: jax.grad(loss_fn)(p, *args), (params,), (z_tree,))
        hdiag = jax.tree_util.tree_map(lambda z_, h: jnp.abs(z_ * h), z_tree, hz)
        count = state["count"] + 1
        c = count.astype(jnp.float32)
        m = jax.tree_util.tree_map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = jax.tree_util.tree_map(lambda v_, h: b2 * v_ + (1 - b2) * h * h, state["v"], hdiag)
        new_params = jax.tree_util.tree_map(
            lambda p, m_, v_: p - lr * (m_ / (1 - b1**c)) / (jnp.sqrt(v_ / (1 - b2**c)) + eps),
            params, m, v,
        )
        return new_params, {"m": m, "v": v, "count": count, "key": k}

    return init, step


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
    # exotic reference entries with real implementations above
    "accsgd": lambda lr, **kw: accsgd(lr, **kw),
    "adabound": lambda lr, **kw: adabound(lr, **kw),
    "adamod": lambda lr, **kw: adamod(lr, **kw),
    "adamp": lambda lr, **kw: adamp(lr, **kw),
    "sgdp": lambda lr, **kw: sgdp(lr, **kw),
    "aggmo": lambda lr, **kw: aggmo(lr, **kw),
    "diffgrad": lambda lr, **kw: diffgrad(lr, **kw),
    "pid": lambda lr, **kw: pid(lr, **kw),
    "qhadam": lambda lr, **kw: qhadam(lr, **kw),
    "qhm": lambda lr, **kw: qhm(lr, **kw),
    "swats": lambda lr, **kw: swats(lr, **kw),
    "shampoo": lambda lr, **kw: shampoo(lr, **kw),
    # ranger family = lookahead composites (their published definition)
    "ranger": lambda lr, **kw: optax.lookahead(optax.radam(lr, **kw), 6, 0.5),
    "rangerqh": lambda lr, **kw: optax.lookahead(qhadam(lr, **kw), 6, 0.5),
    "rangerva": lambda lr, **kw: optax.lookahead(optax.radam(lr, **kw), 6, 0.5),
    "ranger21": lambda lr, **kw: optax.lookahead(
        optax.chain(optax.centralize(), optax.adamw(lr, **kw)), 6, 0.5
    ),
    # torch "Fused*" variants are CUDA speed clones of the base rule —
    # under XLA the base IS fused
    "fusedsgd": lambda lr, **kw: optax.sgd(lr, momentum=0.9, **kw),
    "fusedadam": lambda lr, **kw: optax.adam(lr, **kw),
    "fusedlamb": lambda lr, **kw: optax.lamb(lr, **kw),
    "fusednovograd": lambda lr, **kw: optax.novograd(lr, **kw),
    "nvnovograd": lambda lr, **kw: optax.novograd(lr, **kw),
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
