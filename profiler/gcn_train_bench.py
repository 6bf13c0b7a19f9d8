"""Full GCN training-step benchmark at the reference kernel-bench scale.

Reference protocol (reference profiler/mpops/complete_test/README.md +
profiler/ggl/gcn_trainer.py): ogbn-arxiv edge index (169,343 nodes /
2,315,598 edges), hidden dims {16,64,256}, per-epoch wall time. Here: one
full 2-layer GCN train step (fwd + bwd + adam update), XLA scatter path
vs Pallas plan path, f32 and bf16 features, timed as K chained steps in
one jit.
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--edges", type=int, default=2_315_598)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--classes", type=int, default=40)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    from gammagl_tpu.models import GCNModel
    from gammagl_tpu.utils import add_self_loops

    rng = np.random.default_rng(0)
    N, E = args.nodes, args.edges
    dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
    src = rng.integers(0, N, E)
    ei_np, _ = add_self_loops(np.stack([src, dst]), num_nodes=N)
    ei_np = np.asarray(ei_np)
    ei = jnp.asarray(ei_np.astype(np.int32))
    y = jnp.asarray(rng.integers(0, args.classes, N).astype(np.int32))

    from gammagl_tpu.ops.pallas import build_csr_plan
    plan = build_csr_plan(ei_np[0], ei_np[1], N, ET=512)

    def bench(dtype, use_plan):
        # compute dtype follows the feature dtype; params stay f32
        model = GCNModel(hidden_dim=args.hidden, num_class=args.classes,
                         drop_rate=0.0,
                         dtype=None if dtype == jnp.float32 else dtype)
        x = jnp.asarray(rng.normal(size=(N, args.feat)), dtype)
        params = model.init(jax.random.PRNGKey(0), x, ei)
        opt = optax.adam(1e-3)

        @jax.jit
        def run(params, x):
            opt_state = opt.init(params)

            def body(carry, _):
                params, opt_state = carry
                def loss_fn(p):
                    logits = model.apply(
                        p, x, ei, plan=plan if use_plan else None)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits.astype(jnp.float32), y).mean()
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state)
                return (optax.apply_updates(params, updates),
                        opt_state), loss

            (params, _), losses = jax.lax.scan(
                body, (params, opt_state), None, length=args.steps)
            return losses.sum()

        float(run(params, x))
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            float(run(params, x + jnp.asarray(r * 0.01, dtype)))
            ts.append(time.perf_counter() - t0)
        return min(ts) / args.steps

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        t_x = bench(dtype, False)
        t_p = bench(dtype, True)
        print(f"GCN train step {name} (N={N}, E={ei_np.shape[1]}, "
              f"F={args.feat}->{args.hidden}->{args.classes}): "
              f"XLA {t_x*1e3:.1f} ms, plan {t_p*1e3:.1f} ms, "
              f"{t_x/t_p:.2f}x  ({ei_np.shape[1]*2/t_p/1e6:.0f}M "
              f"edge-traversals/s/layer-pair)")


if __name__ == "__main__":
    main()
