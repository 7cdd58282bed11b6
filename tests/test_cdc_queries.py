"""CDC harness queries vs DuckDB oracle at sf0.001 (driver-style compare)."""

import pytest

from clinical_trials_etl_ray.pipelines import cdc_queries as cq
from tests.util_compare import assert_matches_oracle

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(cq.QUERIES))
def test_cdc_query_matches_oracle(ray_session, name):
    result = cq.QUERIES[name](SF)
    assert_matches_oracle(result, cq.ORACLE_SQL[name], SF)
