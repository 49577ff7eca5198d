"""Test bootstrap: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's hardware split (tests/cpu vs tests/gpu,
reference tests/common.py:24-26) the TPU-native way: the whole suite runs on
CPU with XLA's host-platform device multiplier so sharding/mesh logic is
exercised without TPU hardware; Pallas kernels run in interpreter mode
(selected automatically by the kernels when the backend is not TPU).

Note: this environment registers a TPU backend from sitecustomize.py at
interpreter start (jax is already imported by the time conftest runs), so
the platform is forced via jax.config.update rather than JAX_PLATFORMS. The
XLA_FLAGS device-count flag still works because the CPU client initializes
lazily.
"""

import os

if os.environ.get("FASN_TPU_TESTS"):
    # real-hardware mode (tests/test_tpu_smoke.py): leave the TPU backend
    # alone so Mosaic lowering is actually exercised
    import jax  # noqa: E402
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
