"""Plan-regression CI (VERDICT r07 item #5): the physical-plan STRUCTURE
of the headline queries is pinned to committed fingerprints, so a silent
broadcast->SortMergeJoin flip, a new shuffle Exchange, or a lost
TakeOrderedAndProject fails the suite immediately instead of surfacing
as a bench drift a round later.

Intentional plan changes: run  python tools/dump_plan_fingerprints.py
to regenerate tests/plan_fingerprints.json and commit the diff with the
change that caused it (the tool docstring documents the workflow).
"""

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from dump_plan_fingerprints import HEADLINE, fingerprint  # noqa: E402

from ecommerce_lakehouse_spark.queries import REGISTRY

_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_fingerprints.json")
with open(_PATH) as f:
    _COMMITTED = json.load(f)


def test_every_headline_has_committed_fingerprint():
    missing = [n for n in HEADLINE if n not in _COMMITTED]
    assert not missing, (
        f"no committed fingerprint for {missing}: run tools/dump_plan_fingerprints.py"
    )


@pytest.mark.parametrize("name", HEADLINE)
def test_plan_structure_unchanged(spark, name):
    got = fingerprint(REGISTRY[name](spark, "/root/testdata/sf0.001"))
    want = _COMMITTED[name]
    assert got == want, (
        f"{name}: physical-plan structure changed.\n"
        f"  committed: {want}\n"
        f"  current:   {got}\n"
        "If intentional, regenerate with tools/dump_plan_fingerprints.py "
        "and commit the JSON diff alongside the change."
    )
