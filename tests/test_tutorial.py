"""Execute every fenced python block in docs/tutorial.md.

The reference compiles its tut markdown at doc-build time as de-facto
integration tests (SURVEY.md section 4); this is the same idea for the
rebuild: the tutorial cannot rot.
"""

import pathlib
import re

DOC = pathlib.Path(__file__).parent.parent / "docs" / "tutorial.md"


def test_tutorial_blocks_execute():
    src = DOC.read_text()
    blocks = re.findall(r"```python\n(.*?)```", src, flags=re.DOTALL)
    assert len(blocks) >= 6
    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"tutorial block {i}", "exec"), ns)
        except Exception as e:  # pragma: no cover
            raise AssertionError(
                f"tutorial block {i} failed: {e}\n---\n{block}") from e
