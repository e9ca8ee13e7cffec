"""Documentation snippet tests: every ``documentation/*.md`` file's
```python blocks actually run.

Mirrors the reference's notebook/version checks (SURVEY §4 — executed docs must
match the library) for our markdown-only docs: blocks fenced ```python are
extracted and exec'd IN ORDER within one namespace per file (so later blocks
may use names from earlier ones, like a reader following along); blocks fenced
```python notest are illustrative fragments (undefined placeholder vars,
real-dataset paths) and are skipped but still syntax-checked.

Slow tier: several snippets train for an epoch or compile predict programs.
"""

import ast
import pathlib
import re

import pytest

pytestmark = pytest.mark.slow

DOCS_DIR = pathlib.Path(__file__).resolve().parent.parent / "documentation"
_FENCE = re.compile(r"^```python(?P<tags>[^\n`]*)\n(?P<body>.*?)^```\s*$", re.M | re.S)


def _blocks(md_path):
    text = md_path.read_text()
    out = []
    for m in _FENCE.finditer(text):
        out.append((("notest" in m.group("tags")), m.group("body")))
    return out


DOC_FILES = sorted(DOCS_DIR.glob("*.md"))


def test_docs_exist():
    assert len(DOC_FILES) >= 14, [p.name for p in DOC_FILES]


@pytest.mark.parametrize("md", DOC_FILES, ids=lambda p: p.name)
def test_doc_snippets_run(md, tmp_path, monkeypatch):
    blocks = _blocks(md)
    runnable = [b for skip, b in blocks if not skip]
    assert runnable, f"{md.name} has no executable ```python block"

    # fragments must still be valid syntax (placeholders like `...` are fine
    # as Ellipsis expressions; a typo'd fragment is not)
    for skip, body in blocks:
        if skip:
            try:
                ast.parse(body)
            except SyntaxError as e:
                pytest.fail(f"{md.name} notest block has invalid syntax: {e}")

    monkeypatch.chdir(tmp_path)  # snippets writing relative files stay in tmp
    ns = {"__name__": f"doc_{md.stem}"}
    for i, body in enumerate(runnable):
        try:
            exec(compile(body, f"{md.name}[block {i}]", "exec"), ns)
        except Exception as e:
            pytest.fail(f"{md.name} block {i} failed: {type(e).__name__}: {e}")
