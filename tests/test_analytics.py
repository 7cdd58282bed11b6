"""Analytics operators vs DuckDB oracle at sf0.001 (driver-style compare)."""

import pytest

from clinical_trials_etl_ray.pipelines import analytics as an
from tests.util_compare import assert_matches_oracle

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(an.QUERIES))
def test_analytics_matches_oracle(ray_session, name):
    result = an.QUERIES[name](SF)
    assert_matches_oracle(result, an.ORACLE_SQL[name], SF)
