"""The round-5 bench timing methodology (`bench._chained_rate`): the rate
must come from the slope of wall time vs chain length, cancelling any fixed
per-chain overhead (the ~25 ms tunnel fetch) exactly.  Simulated clock: each
call enqueues 10 ms of "device" work, each fetch drains the queue and adds a
50 ms constant round trip — the correct answer is steps_per_call / 10 ms
regardless of the 50 ms."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_chained_rate_cancels_fixed_fetch_overhead(monkeypatch):
    state = {'pending': 0}

    def call():
        state['pending'] += 1
        return state['pending']

    def fake_fetch(_x):
        time.sleep(state['pending'] * 0.010 + 0.050)
        state['pending'] = 0

    monkeypatch.setattr(bench, '_fetch', fake_fetch)
    rate = bench._chained_rate(call, steps_per_call=1000, n_lo=1, n_hi=5, reps=3)
    true_rate = 1000 / 0.010
    assert 0.85 * true_rate < rate < 1.15 * true_rate, rate


def test_chained_rate_reports_median_of_reps(monkeypatch):
    # one glitched rep (near-zero chain time) must not win
    state = {'pending': 0, 'rep': 0}

    def call():
        state['pending'] += 1
        return state['pending']

    def fake_fetch(_x):
        state['rep'] += 1
        # every 6th fetch pretends the tunnel returned instantly
        glitch = state['rep'] % 6 == 0
        time.sleep(0.0 if glitch else state['pending'] * 0.010 + 0.030)
        state['pending'] = 0

    monkeypatch.setattr(bench, '_fetch', fake_fetch)
    rate = bench._chained_rate(call, steps_per_call=1000, n_lo=1, n_hi=5, reps=3)
    true_rate = 1000 / 0.010
    assert rate < 3.0 * true_rate, f'glitched rep won: {rate}'
