"""Small 2-vector helpers (tuples of arrays) + EDF rotation.

Parity with ``/root/reference/tsadar/utils/vector_tools.py`` (vsub/vdot/vdiv used by
the 2V form factor; ``rotate`` used for multiplexed two-shot angular fits,
loss_function.py:291).
"""

from jax import numpy as jnp

from ..core.physics.interp import interp2d_cubic


def vsub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def vadd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def vdot(a, b):
    if isinstance(a, tuple) and isinstance(b, tuple):
        return sum(x * y for x, y in zip(a, b))
    if isinstance(a, tuple):
        return tuple(x * b for x in a)
    return tuple(a * y for y in b)


def vdiv(a, b):
    if isinstance(a, tuple) and isinstance(b, tuple):
        return tuple(x / y for x, y in zip(a, b))
    if isinstance(a, tuple):
        return tuple(x / b for x in a)
    return tuple(a / y for y in b)


def rotate_edf(f, vx, angle_rad):
    """Rotate a 2D EDF by ``angle_rad`` about the origin (bicubic resample).

    Array convention follows the reference EDF modules: ``f[i, j] = f(vx=vx[j],
    vy=vx[i])`` (row index = vy).  Counterclockwise rotation of the function.
    """
    X, Y = jnp.meshgrid(vx, vx)  # X[i,j]=vx[j] (vx), Y[i,j]=vx[i] (vy)
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    # value at (x, y) after rotating f by +angle = f(R(-angle) (x, y))
    xq = c * X + s * Y
    yq = -s * X + c * Y
    # f indexed [vy, vx] -> interp2d over (row=vy grid, col=vx grid)
    return interp2d_cubic(yq.ravel(), xq.ravel(), vx, vx, f, extrap=True).reshape(f.shape)
