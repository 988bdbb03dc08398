"""Every examples/ script runs green on a shared session — the analogue of
the reference's morpheus-examples module being part of its build
(morpheus-examples/src/main/scala/.../examples/, exercised by
*ExampleTest.scala suites)."""

import importlib
import pathlib
import sys

import pytest

EXAMPLES_DIR = pathlib.Path(__file__).resolve().parent.parent / "examples"
EXAMPLES = sorted(
    p.stem for p in EXAMPLES_DIR.glob("*.py") if not p.stem.startswith("_")
)


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, spark):
    sys.path.insert(0, str(EXAMPLES_DIR))
    try:
        mod = importlib.import_module(name)
        mod.run(spark)
    finally:
        sys.path.remove(str(EXAMPLES_DIR))
