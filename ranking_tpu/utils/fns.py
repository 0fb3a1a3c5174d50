"""Named gain / rank-discount functions shared by losses and metrics.

TPU-native counterpart of the reference's serializable function registry
(tensorflow_ranking/python/keras/utils.py:50-135). Keeping these as named,
registry-addressable functions lets configs (YAML/flags) pick them by string
while the implementations remain plain jittable functions.
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import jax.numpy as jnp

Array = jnp.ndarray
ScalarFn = Callable[[Array], Array]

_LOG2 = math.log(2.0)


def identity(x: Array) -> Array:
  """f(x) = x."""
  return x


def inverse(rank: Array) -> Array:
  """f(rank) = 1 / rank."""
  return 1.0 / rank


def pow_minus_1(label: Array) -> Array:
  """f(label) = 2^label - 1 (the default DCG gain)."""
  return jnp.power(2.0, label) - 1.0


def log2_inverse(rank: Array) -> Array:
  """f(rank) = log(2) / log(1 + rank) (the default DCG discount)."""
  return _LOG2 / jnp.log1p(rank)


def log1p_inverse(rank: Array) -> Array:
  """f(rank) = 1 / log(1 + rank) (natural-log DCG discount, losses default)."""
  return 1.0 / jnp.log1p(rank)


def is_greater_equal_1(label: Array) -> Array:
  """f(label) = I[label >= 1] as float."""
  return (label >= 1.0).astype(jnp.float32)


def symmetric_log1p(x: Array) -> Array:
  """f(x) = sign(x) * log(1 + |x|)."""
  return jnp.sign(x) * jnp.log1p(jnp.abs(x))


GAIN_FNS: Dict[str, ScalarFn] = {
    'identity': identity,
    'pow_minus_1': pow_minus_1,
    'is_greater_equal_1': is_greater_equal_1,
    'symmetric_log1p': symmetric_log1p,
}

RANK_DISCOUNT_FNS: Dict[str, ScalarFn] = {
    'inverse': inverse,
    'log2_inverse': log2_inverse,
    'log1p_inverse': log1p_inverse,
}


def get_gain_fn(name: str) -> ScalarFn:
  if name not in GAIN_FNS:
    raise ValueError(f'Unknown gain fn {name!r}; choices: {list(GAIN_FNS)}')
  return GAIN_FNS[name]


def get_rank_discount_fn(name: str) -> ScalarFn:
  if name not in RANK_DISCOUNT_FNS:
    raise ValueError(
        f'Unknown rank discount fn {name!r}; choices: '
        f'{list(RANK_DISCOUNT_FNS)}')
  return RANK_DISCOUNT_FNS[name]
