"""Full contract sweep: EVERY queries() entry runs and every oracled one
matches its DuckDB SQL (rows + columns + exact values) at sf0.001 — the
driver-style validation as a pytest so it can't rot out of the committed
checks (the round-3 verdict found 34 registry entries that had never been
driver-checked across rounds 1-3). Set LSR_SWEEP_SF to sweep another
scale (the CLI `tools/check_oracles.py` remains the ad-hoc harness)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod  # noqa: E402

SF = os.environ.get("LSR_SWEEP_SF", "/root/testdata/sf0.001")
QS = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def oracle_con():
    from tools.check_oracles import oracle_connection

    return oracle_connection(SF)


@pytest.mark.parametrize("name", sorted(QS))
def test_contract_entry(name, ray_session, oracle_con):
    from tools.check_oracles import check_entry

    status, detail = check_entry(name, SF, oracle_con, QS, ORACLES)
    assert status != "fail", f"{name}: {detail}"
