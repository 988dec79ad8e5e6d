# Root conftest: force the JAX CPU backend with 8 virtual devices for the test
# suite (SURVEY.md §4: multi-"node" testing without hardware). Only pytest loads
# this file, so bench.py / __graft_entry__.py still see the real TPU.
#
# NOTE: this image preloads jaxlib via a site-packages .pth hook, so mutating
# os.environ here is too late for JAX_PLATFORMS/XLA_FLAGS to take effect;
# jax.config.update still works because no backend has initialized yet.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# This image's CPU backend defaults to reduced-precision matmuls; tests compare
# against fp64 numpy oracles, so force full fp32 matmul passes.
jax.config.update("jax_default_matmul_precision", "highest")
