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


def test_latest_rotation_landed():
    """The latest rotation's IN lanes are on the board and its OUT lanes
    are off it but still registered (pytest-oracle coverage is
    board-agnostic: test_workload_oracle parametrizes over ALL of
    ORACLES)."""
    board = set(DRIVER_BOARD)
    rot = ROTATION_LOG[max(ROTATION_LOG)]
    for lane in rot["in"]:
        assert lane in board, f"rotation-in lane {lane} missed the board"
    for lane in rot["out"]:
        assert lane not in board, f"rotation-out lane {lane} still on board"
        assert lane in QUERIES, f"rotation-out lane {lane} was dropped"
        assert lane in ORACLES, f"rotation-out lane {lane} lost its oracle"


def test_rotation_lanes_never_dropped():
    """Every lane that ever appeared in a rotation stays registered and
    oracle-locked (rotating OFF the board must never delete coverage)."""
    for rnd, rot in ROTATION_LOG.items():
        for lane in tuple(rot["in"]) + tuple(rot["out"]):
            assert lane in QUERIES, f"r{rnd} rotation lane {lane} dropped"
            assert lane in ORACLES, f"r{rnd} lane {lane} lost its oracle"


def test_every_oracle_lane_has_had_driver_coverage():
    """Every oracle lane is either on the current board or was on a prior
    round's board. A lane rotated OUT was by definition driver-checked
    while on the board, so the historical set is derivable from
    ROTATION_LOG — a new oracle lane added WITHOUT board placement fails
    here (it appears in neither)."""
    historical = {lane for rot in ROTATION_LOG.values()
                  for lane in rot["out"]}
    uncovered = [k for k in ORACLES
                 if k not in DRIVER_BOARD and k not in historical]
    assert not uncovered, f"oracle lanes with no driver coverage: {uncovered}"


def test_dsir_lanes_on_board():
    """The r9 verdict's headline failure: DSIR lanes claimed on the board
    but absent from CORRECTNESS_r09.  Pin them explicitly."""
    first50 = list(QUERIES)[:50]
    assert "q31_dsir_weights" in first50
    assert "q32_dsir_resample" in first50
