import os

# Tests run chip-agnostic: force CPU with a virtual 8-device mesh so the
# sharding paths are exercised without TPU hardware.  Real-TPU runs are
# done by bench.py / the driver, not the unit suite.  Set JQC_TEST_TPU=1
# to run the suite against the real chip instead.
#
# NOTE: this environment's sitecustomize registers an 'axon' TPU platform
# and force-sets jax.config jax_platforms='axon,cpu' (overriding the
# JAX_PLATFORMS env var), so we must re-override via jax.config here,
# before any backend is initialized.
if os.environ.get("JQC_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # x64 enables the DF64 native-f64 emulation tier on CPU (see
    # joltqc_tpu/ops/df64.py: XLA:CPU excess precision breaks the EFT
    # path, and the reduce_precision workaround compiles too slowly for
    # the suite).  The true EFT path is exercised on the real chip by
    # bench.py / JQC_TEST_TPU=1 runs.
    jax.config.update("jax_enable_x64", True)
