"""Executes every ```python block of the tutorial docs in order.

The reference ships executable tutorials (docs/tutorials/*.ipynb); ours
are markdown with the same property, enforced here: each tutorial's code
blocks, concatenated, must run end to end on CPU against the bundled
reference data. A tutorial that drifts from the library API fails CI.
"""

import pathlib
import re

import pytest

DOCS = pathlib.Path(__file__).resolve().parent.parent / 'docs'

TUTORIALS = sorted(p.name for p in (DOCS / 'tutorials').glob('*.md'))


def _python_blocks(path: pathlib.Path):
  text = path.read_text()
  return re.findall(r'```python\n(.*?)```', text, flags=re.DOTALL)


@pytest.mark.parametrize('name', TUTORIALS)
def test_tutorial_runs(name):
  blocks = _python_blocks(DOCS / 'tutorials' / name)
  assert blocks, f'{name} has no python blocks'
  ns = {'__name__': f'docs.{name}'}
  source = '\n\n'.join(blocks)
  exec(compile(source, str(DOCS / 'tutorials' / name), 'exec'), ns)


def test_getting_started_blocks_compile():
  """getting_started.md uses placeholder paths; require syntax validity."""
  for i, block in enumerate(_python_blocks(DOCS / 'getting_started.md')):
    compile(block, f'getting_started.md[{i}]', 'exec')


def test_api_reference_in_sync():
  """docs/api.md must match the live public surface (docs/gen_api.py).

  Catches API drift: adding/renaming a public symbol or changing a
  dataclass signature without regenerating the reference doc fails here
  with the exact stale lines."""
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      'ranking_tpu_gen_api', DOCS / 'gen_api.py')
  gen = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(gen)
  fresh = gen.render()
  committed = (DOCS / 'api.md').read_text()
  if fresh != committed:
    import difflib
    diff = list(difflib.unified_diff(
        committed.splitlines(), fresh.splitlines(),
        fromfile='docs/api.md (committed)', tofile='gen_api.render() (fresh)',
        lineterm='', n=1))
    raise AssertionError(
        'docs/api.md is stale — run `python docs/gen_api.py`. Drift:\n'
        + '\n'.join(diff[:40]))
