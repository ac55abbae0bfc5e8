"""Plan-construction smoke test for every DEMO_REGISTRY entry
(VERDICT r8 #4).

The r8 close-out miss: a loud-geometry guard added to
`signature_candidate_pairs` broke the `x_dedup_simhash_pairs` demo at
PLAN CONSTRUCTION, but nothing cheaper than the 9-minute full suite
exercised demo construction, so HEAD shipped red. This module builds
every demo's DataFrame — no `.collect()`, no execution beyond what the
operator itself does at plan time — so a guard or signature change can
never again break a demo silently.

`df.columns` forces analysis (column resolution, operator argument
validation), which is exactly the layer the r8 regression lived in.
"""

from __future__ import annotations

import pytest

from purescript_ifrit_spark.suite import DEMO_REGISTRY


@pytest.mark.parametrize("name", sorted(DEMO_REGISTRY))
def test_demo_plan_constructs(spark, sf_dir, name):
    df = DEMO_REGISTRY[name](spark, sf_dir)
    assert df.columns, name
