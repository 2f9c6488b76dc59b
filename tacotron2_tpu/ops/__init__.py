# Pallas TPU kernels (fused hot ops). Populated as kernels land; each op
# ships with a pure-jnp reference implementation and a parity test.
