"""Serving: ahead-of-time compiled, serializable GNN inference.

The reference has no deployment story beyond pickled weights
(SURVEY.md §5 — `net.save_weights` npz files that need the full Python
stack to use). TPU-native serving is different in kind: a jitted forward
with params baked in exports to a **StableHLO artifact** (`jax.export`)
that reloads and runs without the model's Python code, or AOT-compiles
in-process so the first request pays no trace/compile latency.

    sess = InferenceSession(model.apply, params, (x, edge_index))
    logits = sess(x, edge_index)          # AOT-compiled, zero warmup

    blob = export_forward(model.apply, params, (x, edge_index))
    save_exported(blob, "gcn.stablehlo")  # ship this file
    logits = load_exported("gcn.stablehlo").call(x, edge_index)

Shapes are static per artifact — the padding/bucketing discipline used
for training (`data/padding.py`) is exactly what makes fixed-shape
serving artifacts possible: export one artifact per bucket.
"""

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import export as _export

__all__ = ["export_forward", "save_exported", "load_exported",
           "InferenceSession"]


def _specs(example_inputs):
    return tuple(jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype)
                 for a in example_inputs)


def export_forward(apply_fn: Callable, params: Any,
                   example_inputs: Sequence, platforms=None,
                   **apply_kwargs):
    """Export `apply_fn(params, *inputs, **apply_kwargs)` with the params
    baked in as constants. Returns a `jax.export.Exported` (serialize()
    for bytes). `platforms` e.g. ("tpu",) or ("cpu", "tpu") for a
    multi-platform artifact; defaults to the current backend."""
    fn = jax.jit(lambda *inputs: apply_fn(params, *inputs,
                                          **apply_kwargs))
    kw = {"platforms": platforms} if platforms else {}
    return _export.export(fn, **kw)(*_specs(example_inputs))


def save_exported(exported, path):
    """Write a serialized export artifact (StableHLO + calling
    convention) to disk."""
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path):
    """Reload an artifact; `.call(*inputs)` runs it on the current
    backend (no model Python code needed)."""
    with open(path, "rb") as f:
        return _export.deserialize(f.read())


class InferenceSession:
    """In-process AOT-compiled forward: trace + compile happen at
    construction, so the first request runs at steady-state latency.

    compute_dtype: cast float inputs (e.g. bf16 features halve HBM
    gather traffic, PERF_NOTES.md); the output is returned as produced
    by the model (typically f32 logits).
    donate: donate input buffers of the listed argument positions
    (serving loops that overwrite their input each request).
    """

    def __init__(self, apply_fn, params, example_inputs,
                 compute_dtype=None, donate_argnums=(), **apply_kwargs):
        self.compute_dtype = compute_dtype

        def fwd(*inputs):
            if compute_dtype is not None:
                inputs = tuple(
                    a.astype(compute_dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a
                    for a in inputs)
            return apply_fn(params, *inputs, **apply_kwargs)

        jitted = jax.jit(fwd, donate_argnums=donate_argnums)
        self._compiled = jitted.lower(*_specs(example_inputs)).compile()

    @property
    def cost_analysis(self):
        return self._compiled.cost_analysis()

    @property
    def memory_analysis(self):
        return self._compiled.memory_analysis()

    def __call__(self, *inputs):
        return self._compiled(*inputs)
