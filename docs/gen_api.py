"""Regenerates docs/api.md from the live package surface.

Usage: python docs/gen_api.py  (writes docs/api.md in place)
"""

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')

MODULES = ['data', 'models', 'ops', 'parallel', 'pipeline', 'train', 'utils']


def first_line(obj) -> str:
  doc = inspect.getdoc(obj) or ''
  return doc.split('\n')[0].strip()


def kind_of(obj) -> str:
  if inspect.ismodule(obj):
    return 'module'
  if inspect.isclass(obj):
    return 'class'
  if callable(obj):
    return 'fn'
  return 'const'


def render() -> str:
  """Returns the full api.md content for the live package surface."""
  import ranking_tpu
  from ranking_tpu import ops

  lines = [
      '# API reference (public symbols)',
      '',
      'Generated index of the public surface (`python docs/gen_api.py`);',
      'see module docstrings for semantics and reference citations.',
  ]
  for modname in MODULES:
    mod = getattr(ranking_tpu, modname)
    lines += ['', f'## `ranking_tpu.{modname}`', '']
    names = getattr(mod, '__all__', None) or [
        n for n in dir(mod) if not n.startswith('_')]
    for name in sorted(set(names)):
      obj = getattr(mod, name)
      lines.append(f'* `{name}` ({kind_of(obj)}) — {first_line(obj)}')

  loss_keys = sorted(
      v for k, v in vars(ops.RankingLossKey).items()
      if not k.startswith('_') and isinstance(v, str))
  metric_keys = sorted(
      v for k, v in vars(ops.RankingMetricKey).items()
      if not k.startswith('_') and isinstance(v, str))
  lines += ['', '## Loss keys (`ops.RankingLossKey`)', '',
            ', '.join(f'`{k}`' for k in loss_keys)]
  lines += ['', '## Metric keys (`ops.RankingMetricKey`)', '',
            ', '.join(f'`{k}`' for k in metric_keys), '']
  return '\n'.join(lines)


def main():
  content = render()
  out = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'api.md')
  with open(out, 'w') as f:
    f.write(content)
  print(f'wrote {out}: {len(content.splitlines())} lines')


if __name__ == '__main__':
  main()
