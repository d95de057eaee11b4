"""Every tutorial must run (the reference runs its lessons in CI)."""
import importlib
import pathlib
import sys

import pytest

TUTORIALS = sorted(
    p.stem for p in (pathlib.Path(__file__).parent.parent
                     / "tutorials").glob("lesson_*.py"))


@pytest.mark.parametrize("name", TUTORIALS)
def test_tutorial(name):
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent
                           / "tutorials"))
    try:
        mod = importlib.import_module(name)
        mod.main()
    finally:
        sys.path.pop(0)
