"""Execute notebook/demo.ipynb's code cells in order.

The reference's de-facto interactive rig is a notebook
(/root/reference/notebook/python_etl.ipynb); ours ships one too, and
this harness runs every code cell on each suite run so the notebook
can never rot into documentation-only fiction — a renamed operator or
changed column breaks the suite, not a future reader's afternoon. No
jupyter kernel needed: cells share one namespace via exec(), exactly
the semantics of a top-to-bottom notebook run (assert statements in
the cells are real checks; show() output goes to stdout).
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NB = os.path.join(REPO, "notebook", "demo.ipynb")


def test_demo_notebook_runs_top_to_bottom(spark):
    with open(NB) as f:
        nb = json.load(f)
    code_cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert len(code_cells) >= 5
    ns: dict = {"__name__": "__notebook__"}
    for i, cell in enumerate(code_cells):
        src = "".join(cell["source"])
        try:
            exec(compile(src, f"demo.ipynb[cell {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure message aid
            raise AssertionError(
                f"notebook cell {i} failed: {e}\n--- cell source ---\n{src}"
            ) from e
    # the tour must actually have exercised the engine
    assert "spark" in ns and "qs" in ns
