"""Reference model families: the optimization workloads the framework serves.

Each module re-creates one of the reference's sample applications
(samples/torch/*.py) as a jit-compiled JAX optimization model with a
quantitative convergence metric, replacing the reference's missing
test/benchmark story:

* :mod:`fit_cube`     — vertex position + color fitting (cube.py)
* :mod:`fit_earth`    — texture fitting with mipmaps (earth.py)
* :mod:`fit_envphong` — cube-map environment + Phong fitting (envphong.py)
* :mod:`fit_pose`     — pose fitting from silhouette/color (pose.py)
"""
