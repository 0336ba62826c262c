"""Host-side logic of the round-5 measurement drivers.

The chip-facing parts of scripts/probe_drive_steptime.py and
scripts/drive_eval.py run on real hardware; the aggregation/timing logic
they report from is plain Python and is pinned here.
"""

import numpy as np

from scripts.drive_eval import TimedGen
from scripts.probe_drive_steptime import steady_by_count


def test_steady_by_count_drops_each_counts_first_occurrence():
    # mirrors drive_resume.step_time_stats: the first step at each drawn
    # count is the compile step and must not pollute the steady stats
    seq = [5, 9, 5, 14, 2, 9, 14, 2, 7, 7]
    rows = [
        {"num_inference": n, "step_s": 3.3 + 1.25 * n + 0.01 * i}
        for i, n in enumerate(seq)
    ]
    per_count = steady_by_count(rows)
    assert set(per_count) == {2, 5, 7, 9, 14}
    assert all(len(v) == 1 for v in per_count.values())
    # the kept samples are the SECOND occurrences
    assert per_count[5] == [rows[2]["step_s"]]
    assert per_count[7] == [rows[9]["step_s"]]
    # a linear a + b*count model recovers the planted slope from medians
    counts = sorted(per_count)
    med = [float(np.median(per_count[n])) for n in counts]
    b, a = np.polyfit(counts, med, 1)
    assert abs(b - 1.25) < 0.02 and abs(a - 3.3) < 0.2


def test_timed_gen_separates_compile_from_steady():
    calls = {"n": 0}

    def fake_gen(key, prompts):
        calls["n"] += 1
        return np.zeros((len(prompts), 2, 2, 3))

    gen = TimedGen(fake_gen)
    for _ in range(4):
        gen(None, ["p"] * 8)
    # fabricate a slow first call (compile) over the recorded timings
    gen.calls = [5.0, 0.5, 0.5, 0.5]
    s = gen.stats(batch_size=8)
    assert s["batches"] == 4
    assert s["first_call_s"] == 5.0
    assert s["compile_s_est"] == 4.5
    assert s["steady_batch_s"] == 0.5
    assert s["steady_img_per_s"] == 16.0
    assert calls["n"] == 4


def test_timed_gen_single_call_falls_back_to_itself():
    gen = TimedGen(lambda k, p: np.zeros((len(p), 1, 1, 3)))
    gen(None, ["p"] * 4)
    gen.calls = [2.0]  # single batch: the one call IS the steady estimate
    s = gen.stats(batch_size=4)
    assert s["batches"] == 1
    assert s["steady_batch_s"] == 2.0
    assert s["compile_s_est"] == 0.0
