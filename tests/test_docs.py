"""Execute every python code block in docs/API_TOUR.md — the docs are
part of the test suite and cannot rot."""

import os
import re

import jax
import jax.numpy as jnp
import numpy as np

DOC = os.path.join(os.path.dirname(__file__), "..", "docs", "API_TOUR.md")


def _blocks():
    with open(DOC) as f:
        text = f.read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def test_api_tour_snippets_run():
    blocks = _blocks()
    assert len(blocks) >= 10
    # blocks share one namespace, in document order (like a notebook)
    ns = {"jax": jax, "jnp": jnp, "np": np}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"API_TOUR.md[block {i}]", "exec"), ns)
        except Exception as e:
            raise AssertionError(
                f"doc block {i} failed: {e}\n---\n{block}") from e
