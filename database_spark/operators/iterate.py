"""Shared driver-loop helper for iterative fixpoint operators.

The reference's iterative operators (``ArbitraryLengthPathOp``, the GAS
engine, the inference closure) all run to *fixpoint* — they stop when no
new solutions appear, never at an arbitrary round cap.  Our loops do the
same: by default they iterate until convergence; an explicit ``max_iter``
is a safety valve that RAISES instead of silently returning a truncated
(wrong) answer.
"""

from __future__ import annotations

from typing import Iterator


def fixpoint_rounds(max_iter: int | None, what: str) -> Iterator[int]:
    """Yield round indices 0,1,2,… until the caller breaks out.

    If ``max_iter`` is not None and the loop reaches it without the
    caller breaking (i.e. without convergence), raise RuntimeError —
    an incomplete closure is a wrong answer, not a degraded one.
    """
    i = 0
    while True:
        if max_iter is not None and i >= max_iter:
            raise RuntimeError(
                f"{what}: no fixpoint after {max_iter} rounds; "
                "raise max_iter (or pass None to run to convergence)"
            )
        yield i
        i += 1
