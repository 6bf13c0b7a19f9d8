"""First-class profiling/timing harness (SURVEY.md section 5).

The reference profiles with ad-hoc `time.time()` deltas in offline scripts
(reference profiler/ggl/gcn_trainer.py:59, ticktock.h for C++). On TPU
through a relay, naive wall-clock timing is wrong twice over: the per-call
RPC floor varies (2.7-30 ms observed) and identical executions can be
deduped by the relay. The canonical protocol here is therefore:

  * chain K data-dependent steps inside ONE jit (`lax.scan`),
  * fetch exactly one scalar,
  * cycle distinct input buffers across repetitions,
  * report min(reps)/K.

`chain_time` packages that protocol; `trace` wraps `jax.profiler.trace`
for XLA/TPU timeline capture viewable in TensorBoard/Perfetto.
"""

import contextlib
import time

import jax
import jax.numpy as jnp

__all__ = ["chain_time", "trace", "device_timer"]


def chain_time(step, x0, K=8, reps=3, perturb=None):
    """Per-step seconds of `step` (array -> array), measured as K chained
    data-dependent applications inside one jit.

    `step` must map an array (or pytree with a leading array leaf) to an
    array of the same shape. `perturb(x0, r)` produces the distinct input
    for repetition r (default: x0 + r for float arrays).
    """
    if perturb is None:
        def perturb(x, r):
            return x + jnp.asarray(r, x.dtype)

    @jax.jit
    def run(x):
        def body(h, _):
            h = step(h)
            h = h / (jnp.max(jnp.abs(h)) + 1.0)  # bound + data dependency
            return h, ()
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h.astype(jnp.float32).sum()

    float(run(x0))  # compile + warm
    ts = []
    for r in range(reps):
        xr = perturb(x0, r)
        t0 = time.perf_counter()
        float(run(xr))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


@contextlib.contextmanager
def trace(logdir):
    """XLA/TPU timeline capture: `with trace('/tmp/tb'): step()`.

    Open with TensorBoard's profile plugin or Perfetto. Wraps
    `jax.profiler.trace`; the context also blocks on a trailing barrier so
    async dispatch doesn't leak past the capture window.
    """
    with jax.profiler.trace(str(logdir)):
        yield
        # flush pending async work into the trace
        jax.effects_barrier()


@contextlib.contextmanager
def device_timer(label="block", sink=print):
    """Coarse wall-clock bracket with a device barrier on exit (the
    `block_until_ready` timing idiom; for kernel-grade numbers prefer
    chain_time)."""
    t0 = time.perf_counter()
    yield
    jax.effects_barrier()
    sink(f"{label}: {time.perf_counter() - t0:.4f}s")
