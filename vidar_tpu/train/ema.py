"""EMA parameter tracking (the reference's ExpMomentum/LinearMomentum hooks).

Capability match for reference core/hooks/ema.py:8-180: exponential-momentum
EMA with warmup-aware momentum m(t) = (1 - m0) * exp(-(1+t)/gamma) + m0
(ExpMomentumEMAHook) or m(t) = min(m0, (1+t)/(gamma+t)) (LinearMomentumEMAHook);
``ema = (1 - m) * ema + m * param`` each step. Registered but unused by the
released configs — provided for API completeness.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.struct


@flax.struct.dataclass
class EMAState:
    params: Any
    step: jnp.ndarray


def init_ema(params) -> EMAState:
    return EMAState(params=jax.tree.map(jnp.asarray, params),
                    step=jnp.zeros((), jnp.int32))


def update_ema(state: EMAState, params, *, momentum: float = 0.0002,
               gamma: float = 2000.0, mode: str = 'exp') -> EMAState:
    t = state.step.astype(jnp.float32)
    if mode == 'exp':
        m = (1.0 - momentum) * jnp.exp(-(1.0 + t) / gamma) + momentum
    elif mode == 'linear':
        m = jnp.minimum(momentum, (1.0 + t) / (gamma + t))
    else:
        raise ValueError(mode)
    new = jax.tree.map(lambda e, p: (1.0 - m) * e + m * p,
                       state.params, params)
    return EMAState(params=new, step=state.step + 1)
