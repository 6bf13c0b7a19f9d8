"""Hyperbolic / spherical manifold operations (for RGT-style models).

Reference: gammagl/utils/manifold_math.py -- exp/log maps, Mobius addition,
curvature-parameterized distances on the Poincare ball and hypersphere.
"""

import jax.numpy as jnp

__all__ = ["mobius_add", "expmap", "logmap", "expmap0", "logmap0",
           "poincare_distance", "project"]

_EPS = 1e-7


def _lambda_x(x, c):
    return 2.0 / jnp.clip(1 - c * jnp.sum(x * x, -1, keepdims=True), _EPS)


def project(x, c, eps=1e-5):
    """Clip to the open Poincare ball of curvature -c."""
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True).clip(_EPS)
    max_norm = (1 - eps) / jnp.sqrt(c)
    return jnp.where(norm > max_norm, x / norm * max_norm, x)


def mobius_add(x, y, c):
    """Mobius addition on the Poincare ball."""
    xy = jnp.sum(x * y, -1, keepdims=True)
    x2 = jnp.sum(x * x, -1, keepdims=True)
    y2 = jnp.sum(y * y, -1, keepdims=True)
    num = (1 + 2 * c * xy + c * y2) * x + (1 - c * x2) * y
    den = 1 + 2 * c * xy + c * c * x2 * y2
    return num / jnp.clip(den, _EPS)


def expmap(v, x, c):
    """Exponential map of tangent vector v at point x."""
    v_norm = jnp.linalg.norm(v, axis=-1, keepdims=True).clip(_EPS)
    sc = jnp.sqrt(c)
    second = jnp.tanh(sc * _lambda_x(x, c) * v_norm / 2) * v / (sc * v_norm)
    return project(mobius_add(x, second, c), c)


def logmap(y, x, c):
    """Logarithm map of y at base point x."""
    sub = mobius_add(-x, y, c)
    sub_norm = jnp.linalg.norm(sub, axis=-1, keepdims=True).clip(_EPS)
    sc = jnp.sqrt(c)
    return (2 / (sc * _lambda_x(x, c)) * jnp.arctanh(
        jnp.clip(sc * sub_norm, 0, 1 - _EPS)) * sub / sub_norm)


def expmap0(v, c):
    """Exp map at the origin."""
    v_norm = jnp.linalg.norm(v, axis=-1, keepdims=True).clip(_EPS)
    sc = jnp.sqrt(c)
    return project(jnp.tanh(sc * v_norm) * v / (sc * v_norm), c)


def logmap0(y, c):
    y_norm = jnp.linalg.norm(y, axis=-1, keepdims=True).clip(_EPS)
    sc = jnp.sqrt(c)
    return jnp.arctanh(jnp.clip(sc * y_norm, 0, 1 - _EPS)) * y / (
        sc * y_norm)


def poincare_distance(x, y, c):
    sc = jnp.sqrt(c)
    add = mobius_add(-x, y, c)
    return 2 / sc * jnp.arctanh(
        jnp.clip(sc * jnp.linalg.norm(add, axis=-1), 0, 1 - _EPS))
