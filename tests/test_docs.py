"""Docs discipline (SURVEY §4.4 analog of the reference's doctest CI).

1. ``docs/api.md`` must match what ``docs/gen_api.py`` renders — API drift
   fails the suite (the reference runs Documenter doctests in CI).
2. Every tutorial's ```python blocks must EXECUTE, in order, in one shared
   namespace per file (the reference executes tutorial code via Literate).
"""

import io
import os
import re
import sys
import contextlib

import pytest

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")


def test_api_md_is_current():
    sys.path.insert(0, DOCS)
    try:
        import gen_api
    finally:
        sys.path.pop(0)
    rendered = gen_api.render()
    with open(os.path.join(DOCS, "api.md")) as f:
        on_disk = f.read()
    assert rendered == on_disk, (
        "docs/api.md is stale — run `python docs/gen_api.py` and commit")


TUTORIALS = sorted(
    f for f in os.listdir(DOCS)
    if f.startswith("tutorial_") and f.endswith(".md"))


def _python_blocks(path):
    text = open(path).read()
    return re.findall(r"```python\n(.*?)```", text, re.S)


@pytest.mark.parametrize("name", TUTORIALS)
def test_tutorial_executes(name):
    blocks = _python_blocks(os.path.join(DOCS, name))
    assert blocks, f"{name} has no python blocks"
    ns = {"__name__": f"tutorial::{name}"}
    buf = io.StringIO()
    for i, src in enumerate(blocks):
        with contextlib.redirect_stdout(buf):
            try:
                exec(compile(src, f"{name}[block {i}]", "exec"), ns)
            except Exception as ex:  # noqa: BLE001
                raise AssertionError(
                    f"{name} block {i} failed: {type(ex).__name__}: {ex}\n"
                    f"--- block source ---\n{src}") from ex
