"""Stage-specific optimizers (reference ``im2scene/config.py:178-233``).

* Stage A (volume renderer): Adam, G lr 2e-5 / D lr 2e-4, betas (0, 0.9).
* Stage B (full pipeline): StyleGAN2 lazy-regularization ratio-adjusted
  Adam — lr and betas scaled by ``reg_every / (reg_every + 1)`` — with the
  G optimizer updating ONLY ``decoder.*`` params (``config.py:206-215``).
* Encoder stage: Adam 5e-4 (VAE) or Ranger (RAdam + Lookahead) 1e-4.

Implemented as optax chains; the decoder-only restriction is an
``optax.multi_transform`` mask (the functional analog of the reference's
param-group filtering).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import optax


def stage_a_optimizers(
    d_reg_every: int = 1,
) -> Tuple[optax.GradientTransformation, optax.GradientTransformation]:
    """(G, D) optimizers for the volume-renderer stage
    (reference ``config.py:196-200``).

    ``d_reg_every`` is the stage-A lazy-R1 interval
    (``TrainHParams.a_d_reg_every``); at the default 1 (reference parity,
    R1 every step) the D optimizer is plain Adam, at >1 its lr/betas get
    the same ``reg_every/(reg_every+1)`` ratio adjustment StyleGAN2 applies
    under lazy regularization (stage B below)."""
    d_ratio = _reg_ratio(d_reg_every) if d_reg_every > 1 else 1.0
    g = optax.adam(2e-5, b1=0.0, b2=0.9)
    d = optax.adam(2e-4 * d_ratio, b1=0.0**d_ratio, b2=0.9**d_ratio)
    return g, d


def _reg_ratio(reg_every: int) -> float:
    return reg_every / (reg_every + 1) if reg_every > 0 else 1.0


def stage_b_optimizers(
    lr: float = 2e-3, g_reg_every: int = 4, d_reg_every: int = 16
) -> Tuple[optax.GradientTransformation, optax.GradientTransformation]:
    """(G, D) optimizers for the StyleGAN stage with lazy-reg lr/beta
    adjustment (reference ``config.py:202-218``).

    The G transformation must be wrapped with :func:`decoder_only` so only
    ``decoder.*`` parameters train.
    """
    g_ratio = _reg_ratio(g_reg_every)
    d_ratio = _reg_ratio(d_reg_every)
    g = optax.adam(lr * g_ratio, b1=0.0**g_ratio, b2=0.99**g_ratio)
    d = optax.adam(lr * d_ratio, b1=0.0**d_ratio, b2=0.99**d_ratio)
    return g, d


def decoder_only(tx: optax.GradientTransformation, params: Any) -> optax.GradientTransformation:
    """Restrict an optimizer to the ``decoder`` subtree of generator params
    (reference trains only ``decoder.*`` in stage B, ``config.py:206-215``)."""

    def label(tree: Any) -> Any:
        return {
            k: jax.tree_util.tree_map(lambda _: "train" if k == "decoder" else "freeze", v)
            for k, v in tree.items()
        }

    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, label(params)
    )


def gradient_centralization() -> optax.GradientTransformation:
    """GC: subtract the mean over all non-output axes from conv/linear
    gradients (reference ``encoder/ranger.py`` applies it to >1-D grads)."""

    def update(updates, state, params=None):
        del params

        def center(g):
            if g.ndim > 1:
                axes = tuple(range(1, g.ndim))
                return g - g.mean(axis=axes, keepdims=True)
            return g

        import jax

        return jax.tree_util.tree_map(center, updates), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update)


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper holding the slow weights in optimizer STATE
    (``optax.lookahead`` instead forces a LookaheadParams fast/slow pytree
    onto the training loop — incompatible with plain-params loops like
    stage C).  Every ``sync_period`` steps the slow weights take an
    ``alpha`` step toward the fast weights and the fast weights reset to
    them; expressed as ``updates = new_fast - params`` so it composes as a
    standard GradientTransformation."""

    def init(params):
        import jax
        import jax.numpy as jnp

        return {
            "inner": inner.init(params),
            # a REAL copy: aliasing the param buffers here would make
            # donate_argnums=(params, opt_state) donate one buffer twice
            "slow": jax.tree_util.tree_map(jnp.copy, params),
            "step": jnp_zeros_int(),
        }

    def update(updates, state, params):
        import jax
        import jax.numpy as jnp

        if params is None:
            raise ValueError("lookahead requires params in update()")
        u, inner_state = inner.update(updates, state["inner"], params)
        fast = optax.apply_updates(params, u)
        step = state["step"] + 1
        sync = (step % sync_period == 0).astype(jnp.float32)

        # on sync steps the slow weights advance alpha toward fast and the
        # fast weights reset to them; otherwise both stay put
        new_slow = jax.tree_util.tree_map(
            lambda s, f: s + sync * slow_step_size * (f - s), state["slow"], fast
        )
        new_fast = jax.tree_util.tree_map(
            lambda f, ns: (1.0 - sync) * f + sync * ns, fast, new_slow
        )
        final_updates = jax.tree_util.tree_map(lambda nf, p: nf - p, new_fast, params)
        return final_updates, {"inner": inner_state, "slow": new_slow, "step": step}

    return optax.GradientTransformation(init, update)


def jnp_zeros_int():
    import jax.numpy as jnp

    return jnp.zeros((), jnp.int32)


def ranger(lr: float = 1e-4, sync_period: int = 6, slow_step_size: float = 0.5):
    """Ranger = gradient centralization + RAdam + Lookahead (reference
    ``encoder/ranger.py``, 163 LoC; defaults k=6, alpha=0.5)."""
    inner = optax.chain(gradient_centralization(), optax.radam(lr))
    return lookahead(inner, sync_period=sync_period, slow_step_size=slow_step_size)


def encoder_optimizer(vae: bool = True) -> optax.GradientTransformation:
    """Encoder-stage optimizer (reference ``config.py:186-191``): Adam 5e-4
    for the VAE path; Ranger otherwise."""
    if vae:
        return optax.adam(5e-4)
    return ranger(1e-4)
