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
  # Optional lazy-row optimizer for embedding tables (train/sparse.py);
  # matching params bypass `tx` and are stepped sparsely.
  sparse_tx: Optional[Any] = flax.struct.field(pytree_node=False,
                                               default=None)
  sparse_opt_state: Any = None

  def apply_gradients(self, grads: Any,
                      batch_stats: Optional[Any] = None) -> 'TrainState':
    if self.sparse_tx is None:
      updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                              self.params)
      new_params = optax.apply_updates(self.params, updates)
      return self.replace(
          step=self.step + 1,
          params=new_params,
          opt_state=new_opt_state,
          batch_stats=self.batch_stats if batch_stats is None else batch_stats)
    from ranking_tpu.train import sparse as sparse_lib
    dense_grads, sp_grads = sparse_lib.partition(grads, self.sparse_tx)
    dense_params, sp_params = sparse_lib.partition(self.params,
                                                   self.sparse_tx)
    updates, new_opt_state = self.tx.update(dense_grads, self.opt_state,
                                            dense_params)
    new_dense = optax.apply_updates(dense_params, updates)
    new_sparse, new_sparse_state = self.sparse_tx.update(
        sp_grads, self.sparse_opt_state, sp_params)
    return self.replace(
        step=self.step + 1,
        params=sparse_lib.merge(self.params, new_dense, new_sparse),
        opt_state=new_opt_state,
        sparse_opt_state=new_sparse_state,
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
    sparse_tx: Optional[Any] = None,
) -> TrainState:
  """Initializes model variables from an example batch and wraps them.

  ``model.init`` runs jitted, so parameter initialization compiles once and
  never materializes activations for the sample batch.

  ``sparse_tx`` (a ``train.sparse.LazyAdam``) routes params matching its
  table pattern out of ``tx`` and into the lazy-row embedding update.
  """
  init_rngs = {'params': rng,
               'dropout': jax.random.fold_in(rng, 1),
               'noise': jax.random.fold_in(rng, 2),
               'shuffle': jax.random.fold_in(rng, 3)}
  variables = jax.jit(model.init, static_argnames=('training',))(
      init_rngs, context, examples, mask, training=False)
  params = variables['params']
  batch_stats = variables.get('batch_stats', {})
  if sparse_tx is None:
    opt_state, sparse_opt_state = tx.init(params), None
  else:
    from ranking_tpu.train import sparse as sparse_lib
    dense_params, sp_params = sparse_lib.partition(params, sparse_tx)
    opt_state = tx.init(dense_params)
    sparse_opt_state = sparse_tx.init(sp_params)
  return TrainState(
      step=jnp.zeros((), jnp.int32),
      params=params,
      batch_stats=batch_stats,
      opt_state=opt_state,
      tx=tx,
      apply_fn=model.apply,
      sparse_tx=sparse_tx,
      sparse_opt_state=sparse_opt_state)
