"""Pin the SURVEY §2 contract prefix of queries()/oracle_sql().

The driver's correctness checker walks queries() in dict order and may
stop before the end (round 1: first 50 of 155 keys). These tests make a
module reshuffle that pushes a contract row out of the prefix a hard
test failure instead of a silent evidence gap.
"""

from __future__ import annotations

import flink_large_window_spark.api as api
from flink_large_window_spark.contract import CONTRACT_KEYS


def test_contract_has_76_unique_keys():
    assert len(CONTRACT_KEYS) == 76
    assert len(set(CONTRACT_KEYS)) == 76


def test_every_contract_key_is_registered():
    q = api.queries()
    missing = [k for k in CONTRACT_KEYS if k not in q]
    assert not missing, f"contract keys not registered: {missing}"


def test_queries_prefix_is_exactly_the_contract():
    prefix = list(api.queries())[: len(CONTRACT_KEYS)]
    assert prefix == list(CONTRACT_KEYS)


def test_oracle_sql_prefix_is_contract_ordered():
    # oracle_sql() omits rows-only keys, but the keys it does have must
    # appear contract-first in contract order.
    oracles = api.oracle_sql()
    contract_with_oracle = [k for k in CONTRACT_KEYS if k in oracles]
    assert list(oracles)[: len(contract_with_oracle)] == contract_with_oracle


def test_no_contract_key_lost_overall():
    # every contract key resolves to a callable; extras only follow after
    q = api.queries()
    assert set(CONTRACT_KEYS) <= set(q)
    # sanity: registry did not shrink below round-1 size
    assert len(q) >= 155
