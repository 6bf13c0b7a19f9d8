"""Metrics + losses (reference: tlx.metrics.Accuracy usage in trainers and
gammagl/utils/metric_unifews.py F1 helpers)."""

import jax.numpy as jnp
import optax

__all__ = ["accuracy", "micro_f1", "macro_f1", "semi_supervised_loss"]


def semi_supervised_loss(logits, labels, mask):
    """Masked mean cross-entropy (the SemiSpvzLoss of every reference
    trainer, e.g. examples/gcn/gcn_trainer.py:79-81)."""
    ll = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    mask = mask.astype(ll.dtype)
    return (ll * mask).sum() / jnp.maximum(mask.sum(), 1)


def accuracy(logits, labels, mask=None):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if mask is None:
        return correct.mean()
    mask = mask.astype(jnp.float32)
    return (correct * mask).sum() / jnp.maximum(mask.sum(), 1)


def _f1_counts(pred, labels, num_classes):
    tp = jnp.zeros(num_classes)
    fp = jnp.zeros(num_classes)
    fn = jnp.zeros(num_classes)
    for c in range(num_classes):
        tp = tp.at[c].set(((pred == c) & (labels == c)).sum())
        fp = fp.at[c].set(((pred == c) & (labels != c)).sum())
        fn = fn.at[c].set(((pred != c) & (labels == c)).sum())
    return tp, fp, fn


def micro_f1(logits, labels, mask=None):
    pred = jnp.argmax(logits, axis=-1)
    if mask is not None:
        keep = mask.astype(bool)
        # micro-F1 over a mask == masked accuracy for single-label
        return accuracy(logits, labels, mask)
    return (pred == labels).mean()


def macro_f1(logits, labels, num_classes=None):
    pred = jnp.argmax(logits, axis=-1)
    if num_classes is None:
        num_classes = int(logits.shape[-1])
    tp, fp, fn = _f1_counts(pred, labels, num_classes)
    precision = tp / jnp.maximum(tp + fp, 1)
    recall = tp / jnp.maximum(tp + fn, 1)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    return f1.mean()
