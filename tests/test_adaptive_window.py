"""Adaptive decode-window selection (infer.adaptive_window).

The decode window length is chosen per batch from a pow-4 bucket ladder
by maximizing useful slot-steps per unit time from each row's remaining
budget (executor._pick_window) — tail batches run short windows so
finished rows' slots refill from the queue instead of idling, and every
compiled decode program's scan length comes from the bucket ladder (no
arbitrary-length programs near max_seq_len).
"""

import pytest

from chitu_tpu.engine import Engine
from chitu_tpu.task import SampleParams

from helpers import tiny_cfg


@pytest.fixture(scope="module")
def engine():
    return Engine(
        tiny_cfg(
            **{"infer.stop_with_eos": False, "infer.decode_window": 16}
        )
    )


def test_buckets_ladder(engine):
    assert engine.executor._window_buckets() == (16, 4, 1)


def test_uniform_fresh_batch_picks_full_window(engine):
    ex = engine.executor
    assert ex._pick_window([100, 100, 100, 100], min_headroom=100) == 16


def test_tail_batch_picks_short_window(engine):
    ex = engine.executor
    # half the rows are nearly done: a full window would idle their slots
    assert ex._pick_window([2, 2, 1, 2], min_headroom=100) == 1
    assert ex._pick_window([4, 3, 4, 4], min_headroom=100) == 4


def test_single_tail_row_does_not_force_short_window(engine):
    ex = engine.executor
    # one row with 1 token left among fresh rows: rebatching for it is
    # not worth shrinking everyone's window
    assert ex._pick_window([1, 64, 64, 64], min_headroom=64) == 16


def test_headroom_hard_caps_window(engine):
    ex = engine.executor
    # near max_seq_len the window may not exceed the page headroom even
    # when budgets are large
    assert ex._pick_window([64, 64], min_headroom=3) == 1
    assert ex._pick_window([64, 64], min_headroom=5) == 4


def test_adaptive_off_uses_largest_allowed_bucket():
    eng = Engine(
        tiny_cfg(
            **{
                "infer.stop_with_eos": False,
                "infer.decode_window": 16,
                "infer.adaptive_window": False,
            }
        )
    )
    ex = eng.executor
    assert ex._pick_window([2, 2, 1, 2], min_headroom=100) == 16
    assert ex._pick_window([64, 64], min_headroom=5) == 4


def test_all_decode_programs_are_bucketed(engine):
    """Mixed budgets + a prompt near max_seq_len: every compiled decode
    program's window must come from the bucket ladder (arbitrary scan
    lengths would compile mid-traffic)."""
    for n_new in (3, 7, 16):
        engine.generate(
            "bucket probe", SampleParams(temperature=0.0, max_new_tokens=n_new)
        )
    # prompt leaving only a few tokens of headroom to max_seq_len=128
    long_prompt = list(range(5, 125))
    engine.submit(
        "",
        SampleParams(temperature=0.0, max_new_tokens=20),
        prompt_tokens=long_prompt,
    )
    engine.run_until_complete()
    buckets = set(engine.executor._window_buckets())
    for key in engine.executor._jit_decode:
        if key[0] in ("verify",):
            continue
        B, mp, window, greedy, nopen = key
        assert window in buckets, key


def test_mixed_budget_batch_exact_lengths(engine):
    """Rows with very different budgets in one batch: every row emits
    exactly its budget (window adaptation must not under- or over-emit)."""
    budgets = [1, 3, 9, 14]
    reqs = [
        engine.submit(
            f"row {i}", SampleParams(temperature=0.0, max_new_tokens=b)
        )
        for i, b in enumerate(budgets)
    ]
    engine.run_until_complete()
    for r, b in zip(reqs, budgets):
        assert len(r.async_stream.tokens) == b
        assert r.finish_reason == "length"


def test_record_chain_fits_kappa(engine):
    """The online dispatch-cost fit recovers kappa = a/b from synthetic
    (steps, wall) chains obeying wall = a + steps*b."""
    ex = engine.executor
    ex._lat_pairs = []
    a, b = 0.012, 0.002  # 12 ms dispatch overhead, 2 ms/step -> kappa 6
    try:
        for steps in (1, 4, 16, 1, 4, 16, 16, 4):
            ex._record_chain(steps, a + steps * b)
        assert ex._kappa_src == "online"
        assert ex._kappa == pytest.approx(6.0, rel=0.05)
    finally:
        ex._lat_pairs, ex._kappa, ex._kappa_src = [], 1.0, "default"


def test_record_chain_needs_spread(engine):
    """Chains all at one window length cannot identify a/b — the fit
    must not move kappa off its seed."""
    ex = engine.executor
    ex._lat_pairs = []
    ex._kappa, ex._kappa_src = 1.0, "default"
    for _ in range(10):
        ex._record_chain(16, 0.05)
    assert ex._kappa == 1.0
    assert ex._kappa_src == "default"


def test_high_kappa_prefers_long_windows(engine):
    """With dispatch cost ~ many step-equivalents, shrinking the window
    for a tail batch no longer pays: the pick must grow with kappa."""
    ex = engine.executor
    saved = ex._kappa
    try:
        ex._kappa = 0.25
        assert ex._pick_window([2, 2, 1, 2], min_headroom=100) == 1
        ex._kappa = 48.0
        assert ex._pick_window([2, 2, 1, 2], min_headroom=100) == 4
    finally:
        ex._kappa = saved


def test_calibrate_dispatch_seeds_kappa():
    """calibrate_dispatch times the compiled window programs and seeds a
    positive, clamped kappa without touching engine results."""
    eng = Engine(
        tiny_cfg(
            **{"infer.stop_with_eos": False, "infer.decode_window": 16}
        )
    )
    ex = eng.executor
    # compile the (B, full-window) greedy/nopen programs calibration uses
    eng.generate("warm", SampleParams(temperature=0.0, max_new_tokens=17))
    ex.calibrate_dispatch(reps=2)
    assert ex._kappa_src == "calibrated"
    assert 0.25 <= ex._kappa <= 64.0
    # engine still generates correctly after the masked dummy batches
    out = eng.generate(
        "post calibration", SampleParams(temperature=0.0, max_new_tokens=5)
    )
    assert len(out) > 0


def test_tokens_match_non_adaptive():
    """Greedy output must be identical with and without window
    adaptation (it changes scheduling granularity, not math)."""
    outs = []
    for adaptive in (True, False):
        eng = Engine(
            tiny_cfg(
                **{
                    "infer.stop_with_eos": False,
                    "infer.decode_window": 16,
                    "infer.adaptive_window": adaptive,
                }
            )
        )
        outs.append(
            eng.generate(
                "adaptive parity", SampleParams(temperature=0.0, max_new_tokens=13)
            )
        )
    assert outs[0] == outs[1]
