"""Cost budgets for intrinsically super-linear exact operators.

The two exact baselines in this engine whose WORK is quadratic by
their own semantics — within-bucket pairwise cosine and brute-force
batch kNN — were measured at 93× / 54× wall-clock for 10× data
(BENCH_SCALE_r06.json). Correct, documented, and still a
cluster-killer the day someone points the obvious-sounding query name
at a 100 TB table. Spark has no optimizer fence for "this plan's
output is Θ(n²)"; this module is that fence: a cheap up-front
cardinality estimate (one bounded aggregate / two counts — the same
trick Catalyst's CostBasedJoinReorder uses, but against a hard
budget), then either a descriptive refusal or an automatic re-route
onto the bounded-work path.

`CostBudgetExceeded` messages always name the knob (raise the budget)
and the bounded alternative (LSH sub-bucketing / ANN), so the error
is a course-correction, not a dead end.
"""

from __future__ import annotations


class CostBudgetExceeded(RuntimeError):
    """The operator's estimated work exceeds its cost budget; raise
    the budget explicitly or switch to the bounded-work variant the
    message names."""
