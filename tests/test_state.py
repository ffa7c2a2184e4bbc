"""State-machine characterization (mirrors BaseLearningTest.detectPatterns)."""

from itertools import product

from lzma_tpu.core.constants import (
    NEXT_STATE_LITERAL,
    NEXT_STATE_LONGREP,
    NEXT_STATE_MATCH,
    NEXT_STATE_SHORTREP,
    NUM_STATES,
    state_is_literal,
)

_ACTIONS = {
    "lit": NEXT_STATE_LITERAL,
    "match": NEXT_STATE_MATCH,
    "srep": NEXT_STATE_SHORTREP,
    "lrep": NEXT_STATE_LONGREP,
}


def test_transition_tables():
    assert NEXT_STATE_LITERAL.tolist() == [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 4, 5]
    assert NEXT_STATE_MATCH.tolist() == [7] * 7 + [10] * 5
    assert NEXT_STATE_SHORTREP.tolist() == [9] * 7 + [11] * 5
    assert NEXT_STATE_LONGREP.tolist() == [8] * 7 + [11] * 5


def test_all_states_reachable():
    reached = {0}
    frontier = [0]
    while frontier:
        s = frontier.pop()
        for table in _ACTIONS.values():
            t = int(table[s])
            if t not in reached:
                reached.add(t)
                frontier.append(t)
    assert reached == set(range(NUM_STATES))


def test_literal_predicate_tracks_last_op():
    """States <7 iff the latest op was a literal (Base.java:38-40)."""
    for chain in product(_ACTIONS, repeat=4):
        s = 0
        for a in chain:
            s = int(_ACTIONS[a][s])
        assert state_is_literal(s) == (chain[-1] == "lit")


def test_three_literals_reset_to_zero():
    """Literal transitions always converge to 0 within 3 steps."""
    for s in range(NUM_STATES):
        for _ in range(3):
            s = int(NEXT_STATE_LITERAL[s])
        assert s == 0
