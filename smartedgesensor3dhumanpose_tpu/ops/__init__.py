"""Compute kernels: batched small-matrix linalg, triangulation, epipolar
costs, assignment, unscented transforms, and the Levenberg-Marquardt skeleton
prior. All functions are pure, fixed-shape, and jit/vmap-friendly."""
