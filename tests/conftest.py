import os

# The axon harness imports jax at interpreter start (sitecustomize) with
# JAX_PLATFORMS=axon, so env vars are too late — override via jax.config before any
# backend is initialized. Tests run on a virtual 8-device CPU mesh so sharding logic
# is exercised without TPUs; kernels run in interpret mode (see pairhmm_tpu).
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

# Exported (not just jax.config) so CLI-subprocess tests inherit the CPU
# backend instead of the remote axon TPU tunnel (which makes tiny training
# loops latency-bound: ~25ms/roundtrip).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = "/root/reference"


def reference_path(*parts):
    return os.path.join(REFERENCE_ROOT, *parts)
