"""Training state: one pytree, explicit and functional.

Replaces the reference's three generations of training scaffolding
(Estimator model_fn, Keras compile/fit, Orbit task) with a single
``TrainState`` pytree (params + mutable batch statistics + optimizer state +
step) threaded through jitted step functions. Checkpointing is just
serializing this pytree (train/checkpoint.py).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

Array = jax.Array


@flax.struct.dataclass
class TrainState:
  """Everything that evolves during training, as one pytree."""

  step: Array
  params: Any
  batch_stats: Any  # flax 'batch_stats' collection ({} if the model has none)
  opt_state: Any
  tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
  apply_fn: Callable[..., Any] = flax.struct.field(pytree_node=False)

  def apply_gradients(self, grads: Any,
                      batch_stats: Optional[Any] = None) -> 'TrainState':
    updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
    new_params = optax.apply_updates(self.params, updates)
    return self.replace(
        step=self.step + 1,
        params=new_params,
        opt_state=new_opt_state,
        batch_stats=self.batch_stats if batch_stats is None else batch_stats)

  @property
  def variables(self) -> Mapping[str, Any]:
    v = {'params': self.params}
    if self.batch_stats:
      v['batch_stats'] = self.batch_stats
    return v


def create_train_state(
    model: Any,
    tx: optax.GradientTransformation,
    rng: Array,
    context: Mapping[str, Array],
    examples: Mapping[str, Array],
    mask: Array,
) -> TrainState:
  """Initializes model variables from an example batch and wraps them.

  ``model.init`` runs jitted, so parameter initialization compiles once and
  never materializes activations for the sample batch.
  """
  init_rngs = {'params': rng,
               'dropout': jax.random.fold_in(rng, 1),
               'noise': jax.random.fold_in(rng, 2),
               'shuffle': jax.random.fold_in(rng, 3)}
  variables = jax.jit(model.init, static_argnames=('training',))(
      init_rngs, context, examples, mask, training=False)
  params = variables['params']
  batch_stats = variables.get('batch_stats', {})
  return TrainState(
      step=jnp.zeros((), jnp.int32),
      params=params,
      batch_stats=batch_stats,
      opt_state=tx.init(params),
      tx=tx,
      apply_fn=model.apply)
