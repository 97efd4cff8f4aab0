"""Every demo runs (reference: tests/firedrake/demos/test_demos_run.py)."""
import pathlib
import runpy

import pytest

DEMOS = sorted((pathlib.Path(__file__).parents[2] / "demos").glob("*.py"))


@pytest.mark.parametrize("demo", DEMOS, ids=lambda p: p.stem)
def test_demo_runs(demo):
    runpy.run_path(str(demo), run_name="not_main")
