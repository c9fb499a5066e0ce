"""Robust device timing.

On tunneled/async backends ``block_until_ready`` can return before the device
has actually finished (observed on the axon TPU tunnel: apparent 17 PFLOP/s on
a v5e). The only trustworthy sync point is materializing result *bytes* on the
host. ``time_chained`` therefore runs ``n`` data-dependent iterations of the
op inside one jitted ``fori_loop``, fetches a scalar reduction of the result,
and differences two iteration counts to cancel the fixed launch+roundtrip
overhead.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np


def memory_stats(fn: Callable, *args) -> dict:
    """AOT-compile one application of ``fn(*args)`` and return the compiled
    memory assignment (bytes). This pins memory-discipline claims (e.g. the
    colpanel attention group serialization) to a measured figure instead of
    an assumption: run it after any change to a products-scale schedule and
    compare ``temp + argument + output`` against the chip's HBM. Works
    through the axon remote-compile helper (the analysis rides the compiled
    executable). Raises whatever the compiler raises — an OOM here is the
    regression signal."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    ma = compiled.memory_analysis()
    out = {}
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k] = int(v)
    out["total_hbm_bytes"] = (
        out.get("temp_size_in_bytes", 0)
        + out.get("argument_size_in_bytes", 0)
        + out.get("output_size_in_bytes", 0)
        + out.get("generated_code_size_in_bytes", 0)
        - out.get("alias_size_in_bytes", 0)
    )
    return out


def time_chained(
    step_fn: Callable,
    init,
    *,
    iters: int = 32,
    reps: int = 5,
    args: tuple = (),
) -> float:
    """Median seconds per application of ``step_fn`` (x → x, same shape).

    Pass large pytrees (graphs, weight sets) via ``args`` rather than closing
    over them: ``step_fn(x, *args)`` receives them as jit ARGUMENTS. Arrays
    closed over become jaxpr constants, which the axon tunnel's remote-compile
    rejects above ~200 MB (HTTP 413) and which bloat any cache key.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, n, *a):
        return jax.lax.fori_loop(0, n, lambda i, v: step_fn(v, *a), x)

    def timed(n) -> float:
        t0 = time.perf_counter()
        out = run(init, n, *args)
        # force real completion: bytes must reach the host
        float(jax.device_get(jnp.sum(out)))
        return time.perf_counter() - t0

    # warm both iteration counts (single compile thanks to dynamic n)
    timed(1)
    timed(iters + 1)
    samples = [(timed(iters + 1) - timed(1)) / iters for _ in range(reps)]
    est = float(np.median(samples))
    if est <= 0:
        # tunnel jitter swamped the difference — re-estimate with the raw
        # chained time (includes one launch overhead, still an upper bound)
        est = min(timed(iters + 1) / (iters + 1) for _ in range(reps))
    return est
