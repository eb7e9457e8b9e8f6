"""Driver-board composition lock (VERDICT r9 item 1).

The driver's correctness harness checks the QUERIES registry's INSERTION
ORDER [:50].  r9 shipped a rotation that assumed sorted()[:50] and silently
failed — the flagship DSIR lanes never reached the board.  These tests make
the board an explicit, asserted artifact: any registration reorder that
changes the first 50 keys fails CI before it can ship.
"""

from __future__ import annotations

from arc_spark.workload import DRIVER_BOARD, ORACLES, QUERIES, ROTATION_LOG


def test_board_is_first_50_insertion_order():
    assert list(QUERIES)[:50] == list(DRIVER_BOARD)


def test_board_has_exactly_50_unique_lanes():
    assert len(DRIVER_BOARD) == 50
    assert len(set(DRIVER_BOARD)) == 50


def test_every_board_lane_carries_an_oracle():
    missing = [k for k in DRIVER_BOARD if k not in ORACLES]
    assert not missing, f"board lanes without oracle SQL: {missing}"


def test_r11_rotation_landed():
    """The r11 rotation's IN lanes are on the board and its OUT lanes are
    off it but still registered (pytest-oracle coverage is board-agnostic:
    test_workload_oracle parametrizes over ALL of ORACLES)."""
    board = set(DRIVER_BOARD)
    rot = ROTATION_LOG[11]
    for lane in rot["in"]:
        assert lane in board, f"rotation-in lane {lane} missed the board"
    for lane in rot["out"]:
        assert lane not in board, f"rotation-out lane {lane} still on board"
        assert lane in QUERIES, f"rotation-out lane {lane} was dropped"
        assert lane in ORACLES, f"rotation-out lane {lane} lost its oracle"


def test_r10_rotation_lanes_still_registered():
    """r10's IN lanes may rotate off later but must never be dropped; its
    OUT lanes stay registered + oracle-locked."""
    rot = ROTATION_LOG[10]
    for lane in rot["in"] + rot["out"]:
        assert lane in QUERIES, f"r10 rotation lane {lane} was dropped"
        assert lane in ORACLES, f"r10 rotation lane {lane} lost its oracle"


def test_every_oracle_lane_has_had_driver_coverage():
    """r11 closes the coverage asterisk: every oracle lane is either on the
    current board or was on a prior round's board (driver-green r1-r10).
    A new oracle lane added WITHOUT board placement fails here."""
    # lanes driver-verified in r1-r10 under their current keys
    historical = {
        "q01_pricing_summary", "q02_revenue_by_nation", "q03_top_orders",
        "q04_order_priority_exists", "q05_window_topk_per_brand",
        "q06_events_conditional_agg", "q07_time_bucket", "q08_date_trunc",
        "q09_cte_setops", "q10_in_subquery", "q11_having_scalar_subquery",
        "q12_string_funcs", "q13_asof_join", "q14_dedup_exact",
        "q20_lang_id", "q21_quality_score", "q22_token_stats",
        "q23_fingerprint", "q29_rollup", "q30_conditional_pivot",
        "q33_delete_rewrite", "q78_select_order_limit", "q79_count_star",
    }
    uncovered = [k for k in ORACLES
                 if k not in DRIVER_BOARD and k not in historical]
    assert not uncovered, f"oracle lanes with no driver coverage: {uncovered}"


def test_dsir_lanes_on_board():
    """The r9 verdict's headline failure: DSIR lanes claimed on the board
    but absent from CORRECTNESS_r09.  Pin them explicitly."""
    first50 = list(QUERIES)[:50]
    assert "q31_dsir_weights" in first50
    assert "q32_dsir_resample" in first50
