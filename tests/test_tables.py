"""State table + LUT invariants (format constants)."""

import numpy as np

from cmix_tpu.states.tables import (
    NS_NEXT, NS_INIT_P12, NS_NUM_STATES, RUN_NEXT, RUN_INIT_P12)
from cmix_tpu.utils.luts import SQUASH_LUT, STRETCH_LUT, RECIP16_LUT, ST_MAX


def test_nonstationary_closed():
    # every transition from a reachable state lands on a reachable state
    assert NS_NUM_STATES <= 256
    assert NS_NEXT.max() < NS_NUM_STATES
    assert np.all((NS_INIT_P12[:NS_NUM_STATES] >= 1)
                  & (NS_INIT_P12[:NS_NUM_STATES] <= 4095))


def test_nonstationary_directionality():
    # following bit 1 repeatedly must drive P(1) up; bit 0 down
    s = 0
    for _ in range(30):
        s = NS_NEXT[s, 1]
    assert NS_INIT_P12[s] > 3000
    s = 0
    for _ in range(30):
        s = NS_NEXT[s, 0]
    assert NS_INIT_P12[s] < 1000


def test_runmap_runs():
    s = 0
    for _ in range(50):
        s = RUN_NEXT[s, 1]
    assert RUN_INIT_P12[s] > 3500
    s2 = RUN_NEXT[s, 0]
    assert RUN_INIT_P12[s2] < 2300  # broken run resets confidence


def test_luts_monotone_inverse():
    assert SQUASH_LUT.shape[0] == 2 * ST_MAX + 1
    assert np.all(np.diff(SQUASH_LUT) >= 0)
    assert np.all(np.diff(STRETCH_LUT) >= 0)
    # squash(stretch(p)) ~ p
    p = np.arange(16, 4080)
    round_trip = SQUASH_LUT[np.clip(STRETCH_LUT[p], -ST_MAX, ST_MAX) + ST_MAX]
    assert np.max(np.abs(round_trip - p)) < 48
    assert RECIP16_LUT[0] > RECIP16_LUT[1] > RECIP16_LUT[1023]
