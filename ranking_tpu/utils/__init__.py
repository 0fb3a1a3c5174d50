"""Shared tensor utilities for ranking_tpu."""

from ranking_tpu.utils import fns
from ranking_tpu.utils.list_ops import (
    PADDING_LABEL,
    PADDING_PREDICTION,
    PADDING_WEIGHT,
    de_noise,
    gather_per_row,
    is_label_valid,
    organize_valid_indices,
    padded_gather_indices,
    parse_keys_and_weights,
    ragged_to_dense,
    reshape_to_2d,
    sort_by_scores,
    sorted_ranks,
)

__all__ = [
    'PADDING_LABEL',
    'PADDING_PREDICTION',
    'PADDING_WEIGHT',
    'de_noise',
    'fns',
    'gather_per_row',
    'is_label_valid',
    'organize_valid_indices',
    'padded_gather_indices',
    'parse_keys_and_weights',
    'ragged_to_dense',
    'reshape_to_2d',
    'sort_by_scores',
    'sorted_ranks',
]
