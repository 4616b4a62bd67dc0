"""Adaptive host driver for budgeted device-loop segments.

Round-2 root cause of every "kernel fault" seen in round 1 (PERF.md): a
single XLA program *execution* that runs longer than ~60-70 s crashes the
TPU worker (measured with a pure-matmul fori_loop — no Pallas, no gathers:
46 s OK, 67 s OK, 71 s dead), and the process cannot reconnect.  Rows,
kernels and gathers were bystanders; duration was the variable.

Consequently every device-resident colorer loop (the TPU analogue of the
reference's host-free do-while, e.g. coloringMCMC_main.cu:160-269) is
compiled once with a *traced* iteration budget and driven from the host in
segments: run a budget of body iterations, read back two scalars, adapt the
next budget so each execution stays near ``target_s`` seconds.  The body
sequence is identical to the monolithic loop, so results are bit-equal to a
single-execution run; the only cost is one ~32 ms host round-trip per
segment.
"""

from __future__ import annotations

import time

# Keep well clear of the measured ~60 s execution wall.
SEGMENT_TARGET_S = 20.0
# First segment is ONE iteration: it measures per-iteration cost and
# absorbs the (unbounded, harmless) compile time.  It must be 1 — at
# ER(1M) a single sweep runs ~15 s, so a 4-iteration first segment
# crosses the ~60 s wall and kills the worker (measured, round 3);
# the cost for small graphs is one extra ~32 ms readback.
INIT_BUDGET = 1


def drive_segments(
    segment_fn,
    state,
    progress_fn,
    *,
    init_budget: int = INIT_BUDGET,
    target_s: float | None = None,
    grow: float = 8.0,
    on_segment=None,
):
    """Run ``segment_fn(state, budget) -> state`` until the loop reports
    completion.

    ``progress_fn(state) -> (steps_done_delta_capable_counter, done)``:
    reads back (with a host sync) the loop's iteration counter and a
    completion flag.  ``budget`` is passed as a plain int (the segment fn
    must treat it as traced — jit with it as an array argument — so one
    compiled program serves every segment).

    Budget adaptation: after each segment, scale the budget toward
    ``target_s`` seconds of wall per execution, growing at most ``grow``
    x per step (the first, compile-bearing segment cannot over-grow the
    second).  A budget of 1 is always legal: any single body iteration is
    assumed to fit the execution wall.

    ``on_segment(state, steps, budget, elapsed)`` is called after each
    segment (debug attach / checkpoint hooks).
    """
    if target_s is None:
        target_s = SEGMENT_TARGET_S  # module attr: patchable in tests
    budget = max(1, int(init_budget))
    prev_steps, done = progress_fn(state)
    while not done:
        t0 = time.perf_counter()
        state = segment_fn(state, budget)
        steps, done = progress_fn(state)  # host sync
        elapsed = time.perf_counter() - t0
        if on_segment is not None:
            on_segment(state, steps, budget, elapsed)
        executed = max(1, int(steps) - int(prev_steps))
        prev_steps = steps
        if executed < budget and not done:
            # the loop stopped early for its own reasons (e.g. converged
            # flag not yet surfaced); avoid a spin of empty segments
            break
        per = elapsed / executed
        budget = max(1, min(int(budget * grow), int(target_s / max(per, 1e-6))))
    return state
