"""Data-proportional width for explicit CPU-bound exchanges.

The repo pins explicit partition counts on exchanges that feed
CPU-bound stages (md5/shingle/codegen-heavy passes): AQE's
byte-based coalescing only sees the few hundred KB of compressed
input and would collapse such a stage to one task (measured on
text_winnowing at sf0.1: 3.9 s single-task vs ~0.5 s spread).

The r10 pins used ``defaultParallelism`` unconditionally, which
over-shards at the bench's tiny scale factors: 32 tasks of
micro-work cost more in per-task overhead than 8 (BENCH_r10's
8-core/32-core ratios on the pinned queries were 0.69-0.84 — the
8-core run WON). This helper keeps the scale-adaptive intent while
capping the width by the data actually flowing in:

    width = clamp(size_estimate / bytes_per_task, 1, defaultParallelism)

``bytes_per_task`` is a per-site constant chosen from the pass's
measured CPU cost per input byte (md5-grade passes want ~tens of KB
per task so a task is ~100 ms; cheaper passes want more). The size
estimate is Catalyst's plan-time ``sizeInBytes`` — no job is run.
Above any join the estimator explodes (multiplicative fan-out
guesses), which safely degrades to the full ``defaultParallelism``
pin: exactly the prior behaviour. At cluster scale every real corpus
saturates the cap, so production width IS the slot count; only
tiny inputs shrink below it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cpu_spread_width(df: DataFrame, bytes_per_task: int, floor: int = 1) -> int:
    """Partition count for an explicit CPU-bound exchange over ``df``:
    one task per ``bytes_per_task`` of estimated input, clamped to
    [``floor``, ``defaultParallelism``]. Falls back to
    ``defaultParallelism`` when no estimate is available."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — estimator access is best-effort
        return cores
    if est <= 0:
        return cores
    width = (est + bytes_per_task - 1) // bytes_per_task
    return max(floor, min(cores, int(width)))
