#!/usr/bin/env python
"""Symbolic derivation of the projection Jacobians (python/symbol.py analog).

The reference derives its 2×6 image Jacobian with sympy and hard-codes the
result (src/image_alignment.cpp:194-248). This tool re-derives it and checks
the closed form used in sdvo_tpu.geometry.camera / align.image_alignment.
Run: python tools/symbolic_jacobians.py
"""

import sympy as sp


def main():
    x, y, z, fx, fy = sp.symbols("x y z f_x f_y", real=True, positive=False)
    # pinhole projection of a camera-frame point
    u = fx * x / z
    v = fy * y / z
    duv_dp = sp.Matrix([[sp.diff(u, a) for a in (x, y, z)], [sp.diff(v, a) for a in (x, y, z)]])
    # dp/dxi for perturbation exp(xi)·p = p + upsilon + omega × p:
    dp_dxi = sp.Matrix(
        [
            [1, 0, 0, 0, z, -y],
            [0, 1, 0, -z, 0, x],
            [0, 0, 1, y, -x, 0],
        ]
    )
    J = sp.simplify(duv_dp @ dp_dxi)
    print("2x6 pose-projection Jacobian (matches src/image_alignment.cpp:226-248):")
    sp.pprint(J)

    expected = sp.Matrix(
        [
            [fx / z, 0, -fx * x / z**2, -fx * x * y / z**2, fx + fx * x**2 / z**2, -fx * y / z],
            [0, fy / z, -fy * y / z**2, -fy - fy * y**2 / z**2, fy * x * y / z**2, fy * x / z],
        ]
    )
    assert sp.simplify(J - expected) == sp.zeros(2, 6), "mismatch!"
    print("OK: matches the closed form used in sdvo_tpu.align.image_alignment")


if __name__ == "__main__":
    main()
